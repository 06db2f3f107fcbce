"""Fused 2D whole-step kernels vs the jnp reference path (interpret mode).

Reference semantics (solver.py): u* = stencils.predictor ->
apply_velocity_bcs (masks folded in) -> rhs = div(u*) * (rho/dt) * fluid;
u_new = stencils.correct_velocity (+ outflow BC re-application)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import (
    BCSpec,
    apply_velocity_bcs,
    correction_face_masks,
    face_masks_from_solid,
    no_slip_box,
    periodic_axes,
)
from navierstokessolver_tpu.ops import pallas_2d as p2
from navierstokessolver_tpu.ops import stencils
from navierstokessolver_tpu.ops.poisson import build_poisson_op

# Heavy tier (VERDICT r3 item 1): interpret-mode kernel-parity file,
# measured 295s cold on the 1-core box (scripts/time_tests.py). Excluded
# from the default quick suite; run `pytest -m heavy` before commits
# touching the fused kernels or sharded tiers.
pytestmark = pytest.mark.heavy


def _random_u(g, bcs, masks, seed=0):
    r = np.random.default_rng(seed)
    u = tuple(
        jnp.asarray(r.normal(size=g.face_shape(a)).astype(np.float32)) * 0.1
        for a in range(2)
    )
    return apply_velocity_bcs(g, bcs, u, masks)


def _setup_cavity():
    g = GridSpec(shape=(64, 48), lengths=(1.0, 0.75))
    bcs = no_slip_box(g)
    bcs[(1, 1)] = BCSpec.wall((1.0, 0.0))   # moving lid on the y-hi face
    return g, bcs, None


def _setup_cylinderish():
    g = GridSpec(shape=(64, 32), lengths=(8.0, 4.0))
    bcs = {
        (0, 0): BCSpec.inflow((1.0, 0.0)),
        (0, 1): BCSpec.outflow(),
        (1, 0): BCSpec.slip(),
        (1, 1): BCSpec.slip(),
    }
    solid = np.zeros(g.shape, bool)
    solid[14:20, 13:19] = True               # square obstacle
    return g, bcs, solid


def _setup_periodic_box():
    # fully periodic (turbulence/Taylor-Green topology); n1 < L exercises
    # the patched lane wraps
    g = GridSpec(shape=(64, 48), lengths=(1.0, 0.75))
    bcs = {(a, s): BCSpec.periodic() for a in range(2) for s in (0, 1)}
    return g, bcs, None


def _setup_channelish_periodic():
    # streamwise-periodic rows + no-slip walls (periodic channel topology)
    g = GridSpec(shape=(64, 32), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 0)] = BCSpec.periodic()
    bcs[(0, 1)] = BCSpec.periodic()
    return g, bcs, None


def _setup_rb_like():
    # periodic lanes + walls on the rows (Rayleigh-Benard topology);
    # n1 == 128 == L exercises the pure-roll lane-wrap fast path
    g = GridSpec(shape=(32, 128), lengths=(1.0, 4.0))
    bcs = no_slip_box(g)
    bcs[(1, 0)] = BCSpec.periodic()
    bcs[(1, 1)] = BCSpec.periodic()
    return g, bcs, None


def _ref_pred(g, bcs, u, dt, nu, gamma, masks, op):
    u_star = stencils.predictor(g, bcs, u, dt, nu, gamma, None)
    u_star = apply_velocity_bcs(g, bcs, u_star, masks)
    rhs = stencils.divergence(g, u_star) * (1.0 / dt) * op.fluid
    return u_star, rhs


@pytest.mark.parametrize("setup,gamma", [
    (_setup_cavity, 0.0), (_setup_cavity, 0.3), (_setup_cylinderish, 0.2),
    (_setup_periodic_box, 0.3), (_setup_channelish_periodic, 0.0),
    (_setup_rb_like, 0.4),
])
def test_pred2d_matches_jnp(setup, gamma):
    g, bcs, solid = setup()
    assert p2.fused_step2d_applicable(g, bcs)
    per = periodic_axes(g, bcs)
    masks = face_masks_from_solid(g, solid, per)
    op = build_poisson_op(g, bcs, solid)
    u = _random_u(g, bcs, masks)
    dt, nu = 1e-3, 0.01

    ref_star, ref_rhs = _ref_pred(g, bcs, u, dt, nu, gamma, masks, op)

    iu = p2.to_internal_2d(g, u, tile=32)
    codes = p2.build_face_codes(g, masks, correction_face_masks(g, solid, per),
                                tile=32)
    fc = p2.pad_fluid_code(g, op.code, tile=32) if codes is not None else None
    (iu0, iv0), rhs = p2.predictor_rhs_2d_internal(
        g, bcs, iu, dt, nu, gamma, rho=1.0,
        face_codes=codes, fluid_code=fc, tile=32, interpret=True,
    )
    got_u, got_v = p2.from_internal_2d(g, bcs, (iu0, iv0))
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(ref_star[0]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(ref_star[1]), atol=2e-6
    )
    # rhs carries the 1/dt scale (values up to ~1e4 on the random field):
    # compare with a scale-aware tolerance
    scale = float(np.abs(np.asarray(ref_rhs)).max())
    np.testing.assert_allclose(
        np.asarray(rhs), np.asarray(ref_rhs), atol=2e-6 * max(scale, 1.0)
    )


@pytest.mark.parametrize("setup", [
    _setup_cavity, _setup_cylinderish, _setup_periodic_box,
    _setup_channelish_periodic, _setup_rb_like,
])
def test_corr2d_matches_jnp(setup):
    g, bcs, solid = setup()
    per = periodic_axes(g, bcs)
    masks = face_masks_from_solid(g, solid, per)
    corr = correction_face_masks(g, solid, per)
    op = build_poisson_op(g, bcs, solid)
    u = _random_u(g, bcs, masks, seed=1)
    r = np.random.default_rng(2)
    p = jnp.asarray(r.normal(size=g.shape).astype(np.float32)) * 0.01
    scale = 5e-3

    ref = stencils.correct_velocity(g, u, p, scale, corr, per)
    from navierstokessolver_tpu.bcs import BCKind

    if any(bcs[(a, s)].kind is BCKind.OUTFLOW
           for a in range(2) for s in (0, 1)):
        ref = apply_velocity_bcs(g, bcs, ref, masks)
    ref_div = stencils.divergence(g, ref) * op.fluid

    iu = p2.to_internal_2d(g, u, tile=32)
    codes = p2.build_face_codes(g, masks, corr, tile=32)
    fc = p2.pad_fluid_code(g, op.code, tile=32) if codes is not None else None
    (iun, ivn), divm, velm = p2.correct_diag_2d_internal(
        g, bcs, iu, p, scale,
        face_codes=codes, fluid_code=fc, tile=32, interpret=True,
    )
    got_u, got_v = p2.from_internal_2d(g, bcs, (iun, ivn))
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(ref[0]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(ref[1]), atol=2e-6
    )
    np.testing.assert_allclose(
        float(divm), float(jnp.max(jnp.abs(ref_div))), rtol=1e-3
    )


@pytest.mark.parametrize("name,kwargs", [
    ("cavity", dict(shape=(32, 32), re=100.0, poisson_method="mg")),
    ("cylinder", dict(shape=(64, 32), re=100.0, poisson_method="mg")),
    ("taylor_green", dict(shape=(32, 32), re=100.0)),
    ("channel_periodic", dict(shape=(64, 32))),
])
def test_fused2d_sim_matches_reference(name, kwargs):
    """Full projection steps through Simulation with the fused 2D path vs
    the jnp path (interpret mode): velocities/pressure agree to f32
    roundoff after 5 steps, both via step() and via run_scan() (which
    carries the internal layout across iterations)."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case(name, **kwargs)
    sim_ref = case.sim
    p_fused = dataclasses.replace(sim_ref.params, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()
    assert not sim_ref._fused2d_ok()

    st = case.initial_state()
    sr, sf = st, st
    for _ in range(5):
        sr, dr = sim_ref.step(sr)
        sf, df = sim_fused.step(sf)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(sf.u[c]), np.asarray(sr.u[c]), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(sf.p), np.asarray(sr.p), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(df.max_div), float(dr.max_div), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(float(df.max_cfl), float(dr.max_cfl),
                               rtol=1e-3, atol=1e-8)

    # run_scan: internal layout carried across the whole scan
    a, _ = sim_ref.run_scan(st, 5)
    b, _ = sim_fused.run_scan(st, 5)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(b.p), np.asarray(a.p), rtol=2e-4, atol=2e-5
    )


def test_fused2d_cfl_adaptive_matches_reference():
    """CFL-adaptive dt through the fused 2D path: the corrector kernel's
    masked max|u_a|/h_a rides the scan carry and sets each step's dt; the
    per-step dt series and the trajectory match the jnp path, and the CFL
    limiter actually binds (dt < dt_max)."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case("cylinder", shape=(64, 32), re=100.0,
                     poisson_method="mg")
    # dt_max large so the CFL limit is the active constraint every step
    p_ref = dataclasses.replace(case.sim.params, cfl=0.3,
                                dt=10 * case.sim.params.dt)
    sim_ref = dataclasses.replace(case.sim, params=p_ref)
    p_fused = dataclasses.replace(p_ref, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()

    st = case.initial_state()
    a, da = sim_ref.run_scan(st, 8)
    b, db = sim_fused.run_scan(st, 8)
    dta = np.asarray(da.dt)
    dtb = np.asarray(db.dt)
    assert np.all(dtb < p_ref.dt)            # limiter binds
    assert len(np.unique(dtb)) > 1           # and adapts across steps
    np.testing.assert_allclose(dtb, dta, rtol=3e-5)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=5e-5, atol=5e-6
        )
    np.testing.assert_allclose(
        np.asarray(b.p), np.asarray(a.p), rtol=5e-4, atol=5e-5
    )

    # single-step entry agrees too
    sf, df = sim_fused.step(st)
    sr, dr = sim_ref.step(st)
    np.testing.assert_allclose(float(df.dt), float(dr.dt), rtol=1e-6)


@pytest.mark.parametrize("name,kwargs", [
    ("heated_cavity", dict(shape=(32, 32), ra=1e4)),
    ("rayleigh_benard", dict(shape=(64, 32), ra=5e3)),
])
def test_fused2d_thermal_matches_reference(name, kwargs):
    """Fused thermal 2D step: Boussinesq buoyancy in the predictor kernel,
    flux-form theta update in the corrector kernel -- u, p AND theta track
    the jnp path (Rayleigh-Benard also exercises periodic rows + thermal)."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case(name, **kwargs)
    sim_ref = case.sim
    assert sim_ref.scalar is not None
    p_fused = dataclasses.replace(sim_ref.params, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()

    st = case.initial_state()
    assert st.theta is not None
    sr, sf = st, st
    for _ in range(4):
        sr, dr = sim_ref.step(sr)
        sf, df = sim_fused.step(sf)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(sf.u[c]), np.asarray(sr.u[c]), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(sf.theta), np.asarray(sr.theta), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sf.p), np.asarray(sr.p), rtol=2e-4, atol=2e-5
    )

    a, _ = sim_ref.run_scan(st, 6)
    b, _ = sim_fused.run_scan(st, 6)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(b.theta), np.asarray(a.theta), rtol=2e-5, atol=2e-6
    )


def test_fused2d_rk2_matches_reference():
    """RK2 through the fused 2D path (both stages fused; stage 2 anchored
    at the step-start state via the base stream)."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case("cavity", shape=(32, 32), re=100.0,
                     poisson_method="mg", integrator="rk2")
    sim_ref = case.sim
    p_fused = dataclasses.replace(sim_ref.params, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()

    st = case.initial_state()
    a, da = sim_ref.run_scan(st, 5)
    b, db_ = sim_fused.run_scan(st, 5)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(b.p), np.asarray(a.p), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(db_.poisson_iters), np.asarray(da.poisson_iters)
    )


def test_fused2d_convective_outlet_matches_reference():
    """Convective outlet through the fused 2D path: the once-per-step
    transport update of the outlet face (from the carried old face + the
    in-register inner star) and the Dirichlet-ghost pressure correction
    both happen in-kernel; trajectory matches the jnp path."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case("cylinder", shape=(64, 32), re=100.0,
                     poisson_method="mg", outlet="convective")
    sim_ref = case.sim
    p_fused = dataclasses.replace(sim_ref.params, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()

    st = case.initial_state()
    sr, sf = st, st
    for _ in range(5):
        sr, dr = sim_ref.step(sr)
        sf, df = sim_fused.step(sf)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(sf.u[c]), np.asarray(sr.u[c]), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(sf.p), np.asarray(sr.p), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(df.max_div), float(dr.max_div), rtol=1e-3, atol=1e-6
    )

    a, _ = sim_ref.run_scan(st, 5)
    b, _ = sim_fused.run_scan(st, 5)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )


def test_fused2d_thermal_periodic_lane_wrap_flux():
    """Review regression: the theta wrap flux at lane face n1 must use the
    PATCHED roll when n1 % 128 != 0 (plain roll reads the zeroed pad
    lane). Rotated Rayleigh-Benard: periodic LANES, walls on rows,
    buoyancy along rows."""
    import dataclasses

    from navierstokessolver_tpu.bcs import no_slip_box
    from navierstokessolver_tpu.scalar import ScalarBC, ScalarConfig
    from navierstokessolver_tpu.solver import PoissonConfig, SimParams, \
        Simulation
    from navierstokessolver_tpu.grid import State

    g = GridSpec(shape=(32, 48), lengths=(1.0, 1.5))
    bcs = no_slip_box(g)
    bcs[(1, 0)] = BCSpec.periodic()
    bcs[(1, 1)] = BCSpec.periodic()
    scalar = ScalarConfig(
        bcs={(0, 0): ScalarBC.dirichlet(1.0),
             (0, 1): ScalarBC.dirichlet(0.0),
             (1, 0): ScalarBC.periodic(),
             (1, 1): ScalarBC.periodic()},
        diffusivity=0.01,
        buoyancy=(1.0, 0.0),
        upwind_gamma=0.3,
    )
    params = SimParams(dt=2e-3, nu=0.01, poisson=PoissonConfig(
        method="mg", tol=1e-6, max_iters=400))
    sim_ref = Simulation.build(g, bcs, params, scalar=scalar)
    p_fused = dataclasses.replace(params, use_pallas=True)
    sim_fused = dataclasses.replace(
        Simulation.build(g, bcs, p_fused, scalar=scalar),
        pallas_interpret=True,
    )
    assert sim_fused._fused2d_ok()

    r = np.random.default_rng(7)
    theta0 = jnp.asarray(
        0.5 + 0.1 * r.standard_normal(g.shape).astype(np.float32))
    st = State(
        u=(jnp.zeros(g.face_shape(0), jnp.float32),
           jnp.zeros(g.face_shape(1), jnp.float32)),
        p=jnp.zeros(g.shape, jnp.float32),
        theta=theta0,
    )
    a, _ = sim_ref.run_scan(st, 6)
    b, _ = sim_fused.run_scan(st, 6)
    np.testing.assert_allclose(
        np.asarray(b.theta), np.asarray(a.theta), rtol=2e-5, atol=2e-6
    )
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )


def test_fused2d_rk2_with_obstacle_matches_reference():
    """Review follow-up: rk2 + obstacle masks compose in 2D (the base
    stream and the uint8 code stream ride the same windows)."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case

    case = make_case("cylinder", shape=(64, 32), re=100.0,
                     poisson_method="mg", integrator="rk2")
    sim_ref = case.sim
    p_fused = dataclasses.replace(sim_ref.params, use_pallas=True)
    sim_fused = dataclasses.replace(
        sim_ref, params=p_fused, pallas_interpret=True
    )
    assert sim_fused._fused2d_ok()
    st = case.initial_state()
    a, _ = sim_ref.run_scan(st, 4)
    b, _ = sim_fused.run_scan(st, 4)
    for ca, cb in zip(a.u, b.u):
        np.testing.assert_allclose(
            np.asarray(cb), np.asarray(ca), rtol=2e-5, atol=2e-6
        )
