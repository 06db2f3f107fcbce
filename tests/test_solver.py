"""Step-level property tests (SURVEY.md SS4 Property tier): every accepted
step leaves max |div u| below tolerance; diagnostics are well-formed; the
obstacle case keeps solids velocity-free."""

import numpy as np
import pytest

from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.cases.cylinder import impulsive_start_state


def test_divergence_free_every_step():
    case = make_case("cavity", shape=(32, 32))
    st = case.initial_state()
    st, diag = case.sim.run_scan(st, 50)
    assert diag.max_div.shape == (50,)
    assert float(np.max(np.asarray(diag.max_div))) < 1e-3
    assert np.all(np.asarray(diag.poisson_res) <= 1.1e-5)


def test_cfl_stays_bounded():
    case = make_case("cavity", shape=(32, 32))
    st = case.initial_state()
    st, diag = case.sim.run_scan(st, 50)
    assert float(np.max(np.asarray(diag.max_cfl))) < 1.0


def test_obstacle_stays_solid():
    case = make_case(
        "cylinder", shape=(96, 48), lengths=(12.0, 6.0), center=(3.0, 3.01)
    )
    sim = case.sim
    st = impulsive_start_state(sim)
    st, diag = sim.run_scan(st, 100)
    masks = sim.face_masks
    for a in range(2):
        blocked = np.asarray(masks[a]) == 0.0
        vals = np.asarray(st.u[a])[blocked]
        assert np.abs(vals).max() == 0.0
    assert np.isfinite(np.asarray(st.p)).all()
    # wake recirculation behind the cylinder (flow actually separates)
    u = np.asarray(st.u[0])
    assert u[28:40, 20:28].min() < 0.0


def test_3d_cavity_smoke():
    case = make_case("cavity3d", shape=(12, 12, 12), re=100.0)
    st = case.initial_state()
    st, diag = case.sim.run_scan(st, 20)
    assert float(diag.max_div[-1]) < 1e-3
    for a in range(3):
        assert np.isfinite(np.asarray(st.u[a])).all()
    # lid drives interior flow in +x near the top
    u = np.asarray(st.u[0])
    assert u[6, 6, -1] > 0.0 or u[6, 6, -2] > 0.0


def test_cfl_adaptive_dt():
    import dataclasses

    case = make_case("cavity", shape=(32, 32))
    sim = case.sim
    params = dataclasses.replace(sim.params, cfl=0.3, dt=sim.params.dt)
    sim_ad = dataclasses.replace(sim, params=params)
    st = case.initial_state()
    st, diag = sim_ad.run_scan(st, 50)
    dts = np.asarray(diag.dt)
    assert dts.shape == (50,)
    assert (dts <= sim.params.dt + 1e-9).all()
    # lid speed 1, h = 1/32 -> advective limit kicks in below the cap
    assert dts.min() < sim.params.dt
    assert float(np.max(np.asarray(diag.max_cfl))) < 0.5


def test_diag_residual_toggle_identical_physics():
    """PoissonConfig.diag_residual=False skips only the REPORT: pressure
    and velocities are bit-identical, diagnostics carry the -1 sentinel."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case("cavity", shape=(16, 16))
    st = case.initial_state()
    ref, d_on = case.sim.run_scan(st, 10)
    p_off = dataclasses.replace(
        case.sim.params,
        poisson=dataclasses.replace(
            case.sim.params.poisson, diag_residual=False
        ),
    )
    sim_off = dataclasses.replace(case.sim, params=p_off)
    out, d_off = sim_off.run_scan(st, 10)
    np.testing.assert_array_equal(np.asarray(out.p), np.asarray(ref.p))
    np.testing.assert_array_equal(np.asarray(out.u[0]), np.asarray(ref.u[0]))
    assert float(d_off.poisson_res[-1]) == -1.0
    assert 0.0 <= float(d_on.poisson_res[-1]) < 1e-4


def test_extrapolated_warm_start():
    """PoissonConfig.extrapolate: fewer iterations, same physics, stable.

    The damped (beta < 1) extrapolation p + beta (p - p_prev) must match
    the plain warm start's trajectory to solver tolerance while cutting
    iteration counts once the flow evolves smoothly (measured here on the
    cylinder: ~3.0 -> ~2.0 V-cycles/step after spin-up)."""
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

    its = {}
    states = {}
    for beta in (0.0, 0.8):
        # pin mg: the warm start's win shows up in V-cycle counts; the
        # (new) dctcg case default converges in 1-2 applications with or
        # without extrapolation, so there is nothing to measure there
        case = make_case(
            "cylinder", shape=(96, 48), lengths=(12.0, 6.0),
            center=(3.0, 3.01), poisson_extrapolate=beta,
            poisson_method="mg",
        )
        sim = case.sim
        assert sim.params.poisson.extrapolate == beta
        st = impulsive_start_state(sim)
        assert (st.p_prev is not None) == (beta > 0)
        total = 0.0
        for _ in range(4):
            st, d = sim.run_scan(st, 25)
            total += float(np.asarray(d.poisson_iters).sum())
        its[beta] = total
        states[beta] = st
        assert np.isfinite(np.asarray(st.p)).all()
    # same flow to (roughly) solver tolerance
    np.testing.assert_allclose(
        np.asarray(states[0.8].u[0]), np.asarray(states[0.0].u[0]), atol=2e-3
    )
    assert its[0.8] < its[0.0], its


def test_extrapolation_checkpoint_roundtrip(tmp_path):
    """p_prev survives checkpoint/resume bit-exactly (resume == unbroken)."""
    from navierstokessolver_tpu import io as io_mod
    from navierstokessolver_tpu.cases import make_case

    case = make_case("cavity", shape=(16, 16), poisson_method="cg",
                     poisson_extrapolate=0.8)
    sim = case.sim
    st = case.initial_state()
    st, _ = sim.run_scan(st, 12)
    h = io_mod.config_hash(sim.grid, sim.params)
    path = str(tmp_path / "ck.npz")
    io_mod.save_checkpoint(path, st, 12, h)
    st2, step = io_mod.load_checkpoint(path, sim.grid, h)
    assert step == 12 and st2.p_prev is not None
    a, _ = sim.run_scan(st, 10)
    b, _ = sim.run_scan(st2, 10)
    np.testing.assert_array_equal(np.asarray(a.u[0]), np.asarray(b.u[0]))
    np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))


def test_sphere_3d_smoke():
    """Flow past a sphere: the 3D obstacle+outflow topology end-to-end
    (solid faces stay zero, fields finite, flow decelerates in the wake)."""
    case = make_case(
        "sphere", shape=(48, 24, 24), lengths=(12.0, 6.0, 6.0),
        center=(3.0, 3.01, 2.99),
    )
    sim = case.sim
    st = impulsive_start_state(sim)
    st, diag = sim.run_scan(st, 60)
    for a in range(3):
        blocked = np.asarray(sim.face_masks[a]) == 0.0
        assert np.abs(np.asarray(st.u[a])[blocked]).max() == 0.0
        assert np.isfinite(np.asarray(st.u[a])).all()
    assert float(diag.max_div[-1]) < 1e-2
    u = np.asarray(st.u[0])
    # wake deficit just downstream of the sphere vs the free stream
    assert u[14:20, 10:14, 10:14].min() < 0.65
