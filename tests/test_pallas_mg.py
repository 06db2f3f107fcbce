"""Interpret-mode parity for the fused multigrid V-cycle level kernels.

`mg_pre_sweeps_residual` / `mg_add_post_sweeps` (ops/pallas_kernels.py) must
match the jnp V-cycle pieces they replace — `_rb_sweep` loops, the
`(b - apply_A(p)) * fluid` residual, the `(p + e) * fluid` correction-add,
and the solve loop's convergence residual — on every supported topology
(walls, obstacle masks, outflow faces). This is the sanitizer story for TPU
kernels (SURVEY §5 race-detection row): the Pallas kernel in interpret mode
vs the always-kept jnp reference path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec, no_slip_box
from navierstokessolver_tpu.bcs import BCSpec
from navierstokessolver_tpu.ops.poisson import (
    _rb_sweep,
    apply_A,
    build_poisson_op,
    residual_norm,
)


def _setup(shape=(192, 160), solid_block=False, outflow=False, seed=7):
    g = GridSpec(shape=shape, lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    if outflow:
        bcs[(0, 1)] = BCSpec.outflow()
    solid = None
    if solid_block:
        solid = np.zeros(shape, bool)
        solid[60:100, 40:80] = True
    op = build_poisson_op(g, bcs, solid)
    r = np.random.default_rng(seed)
    fl = np.asarray(op.fluid)
    b = jnp.asarray((r.normal(size=shape) * fl).astype(np.float32))
    p0 = jnp.asarray((r.normal(size=shape) * fl).astype(np.float32))
    e = jnp.asarray((r.normal(size=shape) * fl).astype(np.float32))
    return op, p0, b, e


@pytest.mark.parametrize("omega", [1.0, 1.3])
@pytest.mark.parametrize("nsweeps", [1, 3])
def test_pre_kernel_matches_jnp(omega, nsweeps):
    from navierstokessolver_tpu.ops.pallas_kernels import (
        mg_pre_sweeps_residual,
    )

    op, p0, b, _ = _setup()
    ref = p0
    for _ in range(nsweeps):
        ref = _rb_sweep(op, ref, b, omega)
    got_p, got_r = mg_pre_sweeps_residual(
        op, p0, b, nsweeps, omega, tile=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=3e-5)
    # Residual vs the jnp residual of the KERNEL's iterate: comparing
    # against ref's residual would amplify the 3e-5 sweep rounding by the
    # coupling weight w ~ 1/h^2 ~ 1e4 and prove nothing about the kernel.
    ref_r = (b - apply_A(op, got_p)) * op.fluid
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r), atol=2e-2)


def test_pre_kernel_obstacle_outflow():
    from navierstokessolver_tpu.ops.pallas_kernels import (
        mg_pre_sweeps_residual,
    )

    op, p0, b, _ = _setup(solid_block=True, outflow=True)
    ref = p0
    for _ in range(2):
        ref = _rb_sweep(op, ref, b, 1.0)
    got_p, got_r = mg_pre_sweeps_residual(
        op, p0, b, 2, 1.0, tile=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=3e-5)
    ref_r = (b - apply_A(op, got_p)) * op.fluid
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r), atol=2e-2)
    assert float(jnp.max(jnp.abs(got_p * (1.0 - op.fluid)))) == 0.0
    assert float(jnp.max(jnp.abs(got_r * (1.0 - op.fluid)))) == 0.0


@pytest.mark.parametrize("solid_block,outflow", [(False, False), (True, True)])
def test_post_kernel_matches_jnp(solid_block, outflow):
    from navierstokessolver_tpu.ops.pallas_kernels import mg_add_post_sweeps

    op, p0, b, e = _setup(solid_block=solid_block, outflow=outflow)
    ref = (p0 + e) * op.fluid
    for _ in range(2):
        ref = _rb_sweep(op, ref, b, 1.0)
    got_p, got_rsq = mg_add_post_sweeps(
        op, p0, b, e, 2, 1.0, tile=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=3e-5)
    # Convergence scalar vs the jnp norm of the kernel's own iterate (see
    # the pre-kernel test for why not ref's): tolerance-level, the kernel
    # accumulates per-stripe f32 partials.
    rn = residual_norm(op, got_p, b)
    np.testing.assert_allclose(
        float(jnp.sqrt(got_rsq)), float(rn), rtol=1e-3, atol=1e-3
    )


def _mg_pair(shape, solid_block=False, outflow=False):
    """(fused interpret-mode solver, jnp solver) for the same problem."""
    from navierstokessolver_tpu.ops.multigrid import MGPoissonSolver

    g = GridSpec(shape=shape, lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    if outflow:
        bcs[(0, 1)] = BCSpec.outflow()
    solid = None
    if solid_block:
        solid = np.zeros(shape, bool)
        solid[60:100, 40:80] = True
    base = MGPoissonSolver.build(g, bcs, solid, fused=False)
    fused = dataclasses.replace(base, fused=True, interpret=True)
    op = base.ops[0]
    r = np.random.default_rng(11)
    b = jnp.asarray(
        (r.normal(size=shape) * np.asarray(op.fluid)).astype(np.float32)
    )
    return fused, base, op, b


def test_fused_solve_matches_jnp_solve():
    # 192x160 top level is fused (>=128 per side), coarser levels fall back
    # to the jnp path -- the production mixed-hierarchy shape.
    fused, base, op, b = _mg_pair((192, 160), solid_block=True, outflow=True)
    assert fused._fused_ok(0)
    p0 = jnp.zeros_like(b)
    # tol must sit above the f32 residual floor (~5e-5 here: the coupling
    # weight w ~ 1/h^2 ~ 9e3 amplifies rounding in b - A p); below it both
    # paths stagnate at slightly different levels and counts diverge.
    pf, cf, rf = fused.solve(b, p0, tol=2e-4, max_cycles=30)
    pj, cj, rj = base.solve(b, p0, tol=2e-4, max_cycles=30)
    # The fused path's convergence scalar agrees only to f32 tolerance, so
    # a residual sitting exactly on tol can shift the count by one cycle.
    assert abs(int(cf) - int(cj)) <= 1
    assert float(rf) < 2e-4 and float(rj) < 2e-4
    rel = float(
        jnp.linalg.norm(pf - pj) / jnp.maximum(jnp.linalg.norm(pj), 1e-30)
    )
    assert rel < 1e-3


def test_fused_applicability_gates():
    from navierstokessolver_tpu.ops import pallas_kernels

    g = GridSpec(shape=(192, 160), lengths=(2.0, 1.0))
    op = build_poisson_op(g, no_slip_box(g))
    assert pallas_kernels.mg_fused_applicable(op)
    # too small
    gs = GridSpec(shape=(96, 160), lengths=(2.0, 1.0))
    assert not pallas_kernels.mg_fused_applicable(
        build_poisson_op(gs, no_slip_box(gs))
    )
    # periodic axes are excluded (edge-clamped in-kernel shifts)
    gp = GridSpec(shape=(192, 160), lengths=(2.0, 1.0))
    bcp = no_slip_box(gp)
    bcp[(0, 0)] = BCSpec.periodic()
    bcp[(0, 1)] = BCSpec.periodic()
    assert not pallas_kernels.mg_fused_applicable(
        build_poisson_op(gp, bcp)
    )


def test_sharded_simulation_disables_fused_mg():
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.parallel.sharding import (
        make_mesh,
        sharded_simulation,
    )

    sim = make_case("cavity", shape=(64, 64), poisson_method="mg").sim
    assert sim.mg_solver is not None
    fused_sim = dataclasses.replace(
        sim, mg_solver=dataclasses.replace(sim.mg_solver, fused=True)
    )
    n = min(8, len(jax.devices()))
    mesh = make_mesh(n)
    sh = sharded_simulation(fused_sim, mesh)
    assert not sh.mg_solver.fused
    assert not sh.mg_solver.use_pallas
