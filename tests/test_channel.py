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


def test_duct_exact_profile_persists():
    """3D rectangular duct (periodic x, 4 no-slip walls, body force): the
    analytic series solution (White sec. 3-3) is a steady state of the
    discrete system to sub-percent accuracy at 16x16 cross-section."""
    import jax.numpy as jnp
    import numpy as np

    from navierstokessolver_tpu import bcs as bcs_mod
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.cases.channel import duct_profile_exact
    from navierstokessolver_tpu.grid import State

    case = make_case("duct_periodic", shape=(32, 16, 16))
    sim = case.sim
    g = sim.grid
    fx = float(np.asarray(sim.forcing[0]).ravel()[0])
    exact = duct_profile_exact(16, 16, g.lengths[1], g.lengths[2],
                               fx / sim.params.nu)

    st = sim.initial_state()
    u0 = jnp.broadcast_to(jnp.asarray(exact, g.dtype)[None], g.face_shape(0))
    u = bcs_mod.apply_velocity_bcs(g, sim.bcs, (u0, st.u[1], st.u[2]))
    st, d = sim.run_scan(State(u=u, p=st.p), 400)

    uc = np.asarray(st.u[0][:-1].mean(axis=0))   # streamwise-averaged u(y,z)
    rel = np.abs(uc - exact).max() / exact.max()
    assert rel < 0.01, rel
    assert float(d.max_div[-1]) < 1e-4
    # transverse velocities stay numerically zero (fully developed flow)
    assert np.abs(np.asarray(st.u[1])).max() < 1e-5
    assert np.abs(np.asarray(st.u[2])).max() < 1e-5
