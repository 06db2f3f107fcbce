"""Integration: Poiseuille channel (BASELINE.json config #2, SURVEY.md SS4).

The analytic parabolic profile is a steady solution of the discrete system
(central differences are exact for quadratics), so it must persist under
time stepping with inflow/outflow BCs.
"""

import numpy as np
import pytest

from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.cases.channel import parabolic_profile, poiseuille_state


@pytest.fixture(scope="module")
def channel():
    return make_case("channel", shape=(64, 16), lengths=(4.0, 1.0))


def test_poiseuille_profile_persists(channel):
    sim = channel.sim
    st = poiseuille_state(sim)
    u0 = np.asarray(st.u[0]).copy()
    st, diag = sim.run_scan(st, 200)
    drift = np.abs(np.asarray(st.u[0]) - u0).max()
    assert drift < 2e-2, f"Poiseuille drift {drift:.3e}"
    assert float(diag.max_div[-1]) < 1e-3


def test_channel_develops_from_rest(channel):
    """Starting quiescent, the inflow drives the channel toward the parabola."""
    sim = channel.sim
    st = channel.initial_state()
    st, _ = sim.run_scan(st, 1500)
    g = sim.grid
    profile = np.asarray(parabolic_profile(g, 1.0))
    mid = g.shape[0] // 2
    u_mid = np.asarray(st.u[0])[mid, :]
    # Not fully developed yet, but clearly parabolic-ish: max near center,
    # positive correlation with the analytic profile.
    corr = np.corrcoef(u_mid, profile)[0, 1]
    assert corr > 0.99, corr
    assert abs(u_mid.argmax() - g.shape[1] // 2) <= 1


def test_mass_conservation_inflow_outflow(channel):
    """Outflow flux tracks inflow flux once the field is divergence-free."""
    sim = channel.sim
    st = poiseuille_state(sim)
    st, _ = sim.run_scan(st, 100)
    u = np.asarray(st.u[0])
    q_in = u[0, :].sum()
    q_out = u[-1, :].sum()
    assert abs(q_out - q_in) / abs(q_in) < 5e-3


def test_convective_outlet_preserves_poiseuille():
    """The analytic parabola is a steady state under the convective outlet
    too (at steady state the boundary equals its inner neighbor, so the
    convective update is a no-op)."""
    from navierstokessolver_tpu.cases.channel import (
        build_channel, poiseuille_state,
    )

    import jax.numpy as jnp

    case = build_channel(shape=(64, 32), outlet="convective", poisson_method="mg")
    sim = case.sim
    st = poiseuille_state(sim)
    st2, d = sim.run_scan(st, 200)
    drift = float(jnp.max(jnp.abs(st2.u[0] - st.u[0])))
    assert drift < 5e-3, drift
    assert float(d.max_div[-1]) < 1e-4
