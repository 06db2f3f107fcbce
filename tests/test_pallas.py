"""Pallas kernel parity vs the jnp reference path, in interpret mode on CPU
(SURVEY.md SS5: kernels validated against jnp reference implementations --
the TPU sanitizer story)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec, no_slip_box
from navierstokessolver_tpu.bcs import BCSpec, apply_velocity_bcs
from navierstokessolver_tpu.ops import stencils
from navierstokessolver_tpu.ops.pallas_kernels import predictor_2d

# Heavy tier (VERDICT r3 item 1): interpret-mode kernel-parity file,
# measured 161s cold on the 1-core box (scripts/time_tests.py). Excluded
# from the default quick suite; run `pytest -m heavy` before commits
# touching the fused kernels or sharded tiers.
pytestmark = pytest.mark.heavy


def _random_state(grid, bcs, seed=0):
    r = np.random.default_rng(seed)
    u = tuple(
        jnp.asarray(r.normal(size=grid.face_shape(a)), grid.dtype)
        for a in range(2)
    )
    return apply_velocity_bcs(grid, bcs, u)


def _compare(grid, bcs, gamma, seed=0, atol=2e-5):
    u = _random_state(grid, bcs, seed)
    dt, nu = 1e-3, 0.05
    ref = stencils.predictor(grid, bcs, u, dt, nu, gamma)
    got = predictor_2d(grid, bcs, u, dt, nu, gamma, tile=16, interpret=True)
    for a in range(2):
        # interior faces only: boundary faces are BC-pass territory
        sl = [slice(None)] * 2
        sl[a] = slice(1, -1)
        np.testing.assert_allclose(
            np.asarray(got[a])[tuple(sl)],
            np.asarray(ref[a])[tuple(sl)],
            atol=atol,
            err_msg=f"component {a} gamma={gamma}",
        )


def test_parity_cavity_central():
    g = GridSpec(shape=(24, 16), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(1, 1)] = BCSpec.wall((1.0, 0.0))
    _compare(g, bcs, gamma=0.0)


def test_parity_cavity_upwind():
    g = GridSpec(shape=(24, 16), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(1, 1)] = BCSpec.wall((1.0, 0.0))
    _compare(g, bcs, gamma=0.7, seed=3)


def test_parity_channel_bcs():
    g = GridSpec(shape=(32, 8), lengths=(4.0, 1.0))
    profile = jnp.linspace(0.1, 1.0, 8)
    bcs = {
        (0, 0): BCSpec.inflow((profile, 0.0)),
        (0, 1): BCSpec.outflow(),
        (1, 0): BCSpec.wall((0.0, 0.0)),
        (1, 1): BCSpec.wall((0.0, 0.0)),
    }
    _compare(g, bcs, gamma=0.3, seed=5)


def test_parity_slip_bcs():
    g = GridSpec(shape=(16, 16), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(1, 0)] = BCSpec.slip()
    bcs[(1, 1)] = BCSpec.slip()
    _compare(g, bcs, gamma=0.0, seed=7)


def test_parity_anisotropic_grid():
    g = GridSpec(shape=(40, 24), lengths=(2.0, 0.5))
    bcs = no_slip_box(g)
    bcs[(1, 1)] = BCSpec.wall((2.0, 0.0))
    _compare(g, bcs, gamma=0.5, seed=11)


def test_step_with_pallas_matches_reference():
    """Full projection step with the fused predictor vs the jnp step."""
    from navierstokessolver_tpu.cases import make_case
    import dataclasses

    case = make_case("cavity", shape=(32, 32))
    sim = case.sim
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_pallas = dataclasses.replace(sim, params=params, pallas_interpret=True)
    st = case.initial_state()
    a, _ = sim.run_scan(st, 20)
    b, _ = sim_pallas.run_scan(st, 20)
    np.testing.assert_allclose(
        np.asarray(a.u[0]), np.asarray(b.u[0]), atol=5e-5
    )
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=5e-4)


# ---------------------------------------------------------------------------
# Fused RB-sweep kernel parity (interpret mode)
# ---------------------------------------------------------------------------

def _sweep_setup(shape=(160, 128), solid_block=False, outflow=False, seed=3):
    from navierstokessolver_tpu.ops.poisson import build_poisson_op

    g = GridSpec(shape=shape, lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    if outflow:
        bcs[(0, 1)] = BCSpec.outflow()
    solid = None
    if solid_block:
        solid = np.zeros(shape, bool)
        solid[40:80, 30:60] = True
    op = build_poisson_op(g, bcs, solid)
    r = np.random.default_rng(seed)
    fl = np.asarray(op.fluid)
    b = jnp.asarray((r.normal(size=shape) * fl).astype(np.float32))
    p0 = jnp.asarray((r.normal(size=shape) * fl).astype(np.float32))
    return op, p0, b


@pytest.mark.parametrize("omega", [1.0, 1.45])
@pytest.mark.parametrize("nsweeps", [1, 3])
def test_rb_sweeps_kernel_matches_jnp(omega, nsweeps):
    from navierstokessolver_tpu.ops.pallas_kernels import rb_sweeps
    from navierstokessolver_tpu.ops.poisson import _rb_sweep

    op, p0, b = _sweep_setup()
    ref = p0
    for _ in range(nsweeps):
        ref = _rb_sweep(op, ref, b, omega)
    got = rb_sweeps(op, p0, b, omega, nsweeps, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_rb_sweeps_kernel_obstacle_outflow():
    from navierstokessolver_tpu.ops.pallas_kernels import rb_sweeps
    from navierstokessolver_tpu.ops.poisson import _rb_sweep

    op, p0, b = _sweep_setup(solid_block=True, outflow=True)
    ref = p0
    for _ in range(2):
        ref = _rb_sweep(op, ref, b, 1.0)
    got = rb_sweeps(op, p0, b, 1.0, 2, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    # solid cells stay exactly zero
    assert float(jnp.max(jnp.abs(got * (1.0 - op.fluid)))) == 0.0


# ---------------------------------------------------------------------------
# 3D fused predictor parity (interpret mode)
# ---------------------------------------------------------------------------

def _random_state3d(grid, bcs, seed=0):
    r = np.random.default_rng(seed)
    u = tuple(
        jnp.asarray(r.normal(size=grid.face_shape(a)), grid.dtype)
        for a in range(3)
    )
    return apply_velocity_bcs(grid, bcs, u)


@pytest.mark.parametrize("gamma", [0.0, 0.5])
def test_predictor3d_matches_jnp(gamma):
    from navierstokessolver_tpu.ops.pallas_kernels import predictor_3d

    g = GridSpec(shape=(24, 16, 8), lengths=(1.5, 1.0, 0.5))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.wall((0.7, 0.2, 0.0))   # moving lid
    u = _random_state3d(g, bcs)
    dt, nu = 1e-3, 0.05
    ref = stencils.predictor(g, bcs, u, dt, nu, gamma)
    got = predictor_3d(g, bcs, u, dt, nu, gamma, tile=8, interpret=True)
    for a in range(3):
        # interior faces only: boundary faces are BC-pass territory
        idx = [slice(None)] * 3
        idx[a] = slice(1, -1)
        np.testing.assert_allclose(
            np.asarray(got[a])[tuple(idx)],
            np.asarray(ref[a])[tuple(idx)],
            atol=3e-5,
        )


def test_predictor3d_slip_outflow_lane_faces():
    """Exercises the in-kernel lane-ghost linear fixes for SLIP (tangential
    copy) and OUTFLOW (face copy) on the axis-2 faces."""
    from navierstokessolver_tpu.ops.pallas_kernels import (
        predictor_3d, predictor_3d_applicable)

    g = GridSpec(shape=(16, 8, 16), lengths=(1.0, 0.5, 1.0))
    bcs = no_slip_box(g)
    bcs[(2, 0)] = BCSpec.slip()
    bcs[(2, 1)] = BCSpec.outflow()
    assert predictor_3d_applicable(g, bcs)
    u = _random_state3d(g, bcs, seed=4)
    ref = stencils.predictor(g, bcs, u, 1e-3, 0.02, 0.3)
    got = predictor_3d(g, bcs, u, 1e-3, 0.02, 0.3, tile=8, interpret=True)
    for a in range(3):
        idx = [slice(None)] * 3
        idx[a] = slice(1, -1)
        np.testing.assert_allclose(
            np.asarray(got[a])[tuple(idx)],
            np.asarray(ref[a])[tuple(idx)],
            atol=3e-5,
        )


def test_residual_3d_matches_jnp():
    """Fused Poisson-residual kernel vs ops.poisson (interpret mode):
    r = (b - A p) * fluid to f32 roundoff, with and without obstacles."""
    import numpy as np
    import jax.numpy as jnp
    from navierstokessolver_tpu import GridSpec
    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.ops.poisson import apply_A, build_poisson_op
    from navierstokessolver_tpu.ops.pallas_kernels import residual_3d

    rng = np.random.default_rng(0)
    for shape, mk_solid in (((16, 12, 16), False), ((24, 16, 16), True)):
        g = GridSpec(shape=shape, lengths=(1.0, 1.0, 1.0))
        bcs = no_slip_box(g)
        bcs[(1, 1)] = BCSpec.outflow()
        solid = None
        if mk_solid:
            solid = np.zeros(shape, bool)
            solid[8:12, 4:8, 6:10] = True
        op = build_poisson_op(g, bcs, solid)
        p = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * op.fluid
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * op.fluid
        ref = (b - apply_A(op, p)) * op.fluid
        got = residual_3d(op, p, b, tile=8, interpret=True)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-6


# ---------------------------------------------------------------------------
# LES subgrid stress through the fused 3D predictor (interpret mode)
# ---------------------------------------------------------------------------

def _les_parity(g, bcs, seed=0, gamma=0.0):
    from navierstokessolver_tpu.les import (
        LESConfig, eddy_viscosity, sgs_forcing)
    from navierstokessolver_tpu.ops.pallas_kernels import predictor_3d

    u = _random_state3d(g, bcs, seed=seed)
    dt, nu = 1e-3, 0.05
    cfg = LESConfig(cs=0.2)
    sgs = sgs_forcing(g, bcs, u, cfg)
    ref = stencils.predictor(g, bcs, u, dt, nu, gamma, forcing=sgs)
    nu_t = eddy_viscosity(g, bcs, u, cfg)
    got = predictor_3d(g, bcs, u, dt, nu, gamma, tile=8, interpret=True,
                       nu_t=nu_t)
    for a in range(3):
        idx = [slice(None)] * 3
        idx[a] = slice(1, -1)
        np.testing.assert_allclose(
            np.asarray(got[a])[tuple(idx)],
            np.asarray(ref[a])[tuple(idx)],
            atol=5e-5,
        )


def test_predictor3d_les_matches_jnp_walls():
    g = GridSpec(shape=(16, 16, 8), lengths=(1.0, 1.0, 0.5))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.wall((0.7, 0.2, 0.0))
    _les_parity(g, bcs, seed=1, gamma=0.3)


def test_predictor3d_les_matches_jnp_slip_outflow_lanes():
    g = GridSpec(shape=(16, 8, 16), lengths=(1.0, 0.5, 1.0))
    bcs = no_slip_box(g)
    bcs[(2, 0)] = BCSpec.slip()
    bcs[(2, 1)] = BCSpec.outflow()
    _les_parity(g, bcs, seed=4)


def test_predictor3d_les_matches_jnp_periodic():
    from navierstokessolver_tpu.ops.pallas_kernels import (
        predictor_3d_applicable)

    g = GridSpec(shape=(16, 8, 128), lengths=(1.0, 0.5, 8.0))
    bcs = {(a, s): BCSpec.periodic() for a in range(3) for s in (0, 1)}
    assert predictor_3d_applicable(g, bcs)
    # periodic forcing covers ALL n faces; compare them all
    from navierstokessolver_tpu.les import (
        LESConfig, eddy_viscosity, sgs_forcing)
    from navierstokessolver_tpu.ops.pallas_kernels import predictor_3d

    u = _random_state3d(g, bcs, seed=7)
    dt, nu = 1e-3, 0.05
    cfg = LESConfig(cs=0.2)
    ref = stencils.predictor(g, bcs, u, dt, nu, 0.0,
                             forcing=sgs_forcing(g, bcs, u, cfg))
    got = predictor_3d(g, bcs, u, dt, nu, 0.0, tile=8, interpret=True,
                       nu_t=eddy_viscosity(g, bcs, u, cfg))
    for a in range(3):
        idx = [slice(None)] * 3
        idx[a] = slice(1, -1)
        np.testing.assert_allclose(
            np.asarray(got[a])[tuple(idx)],
            np.asarray(ref[a])[tuple(idx)],
            atol=5e-5,
        )


def test_les_step_kernel_path_matches_jnp_step():
    """Solver-level: the _pallas_les_ok kernel route reproduces the jnp
    LES step (interpret mode) on a 3D heated-free cavity."""
    import dataclasses

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.les import LESConfig

    case = make_case("cavity3d", shape=(16, 16, 16), re=500.0)
    sim_j = dataclasses.replace(case.sim, les=LESConfig(cs=0.2))
    sim_k = dataclasses.replace(
        sim_j,
        params=dataclasses.replace(sim_j.params, use_pallas=True),
        pallas_interpret=True,
    )
    assert sim_k._pallas_les_ok()
    ref, dr = sim_j.run_scan(case.initial_state(), 5)
    got, dg = sim_k.run_scan(case.initial_state(), 5)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(got.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        float(dg.max_div[-1]), float(dr.max_div[-1]), atol=1e-5
    )


def test_nu_t_kernel_matches_jnp():
    """Pallas cell-centered Smagorinsky nu_t == les.eddy_viscosity to f32
    roundoff (interpret mode) across BC tables."""
    from navierstokessolver_tpu.les import LESConfig, eddy_viscosity
    from navierstokessolver_tpu.ops.pallas_kernels import (
        build_canon_3d, nu_t_3d_from_canon)

    tables = []
    g1 = GridSpec(shape=(16, 16, 8), lengths=(1.0, 1.0, 0.5))
    b1 = no_slip_box(g1)
    b1[(0, 1)] = BCSpec.wall((0.7, 0.2, 0.0))
    tables.append((g1, b1))
    g2 = GridSpec(shape=(16, 8, 16), lengths=(1.0, 0.5, 1.0))
    b2 = no_slip_box(g2)
    b2[(2, 0)] = BCSpec.slip()
    b2[(2, 1)] = BCSpec.outflow()
    tables.append((g2, b2))
    g3 = GridSpec(shape=(16, 8, 128), lengths=(1.0, 0.5, 8.0))
    b3 = {(a, s): BCSpec.periodic() for a in range(3) for s in (0, 1)}
    tables.append((g3, b3))

    for seed, (g, bcs) in enumerate(tables):
        u = _random_state3d(g, bcs, seed=seed)
        cfg = LESConfig(cs=0.2)
        ref = eddy_viscosity(g, bcs, u, cfg)
        canon = build_canon_3d(g, bcs, u, tile=8)
        got = nu_t_3d_from_canon(
            g, bcs, canon, cfg.cs ** 2 * cfg.filter_width(g) ** 2,
            tile=8, interpret=True,
        )
        scale = float(jnp.max(ref)) + 1e-30
        err = float(jnp.max(jnp.abs(got - ref))) / scale
        assert err < 2e-6, (seed, err)
