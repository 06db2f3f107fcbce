"""Poisson solver tests: manufactured solutions, dense-solve cross-check,
solver-agreement (SURVEY.md SS4 Unit tier, "all four converge to same fixed
point; CG iters << relaxation iters")."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
from navierstokessolver_tpu.ops.poisson import (
    PoissonConfig,
    apply_A,
    build_poisson_op,
    deflate,
    residual_norm,
    solve_poisson,
)

METHODS = ["jacobi", "gs", "sor", "cg"]


@pytest.fixture(scope="module")
def neumann_setup():
    g = GridSpec(shape=(24, 16), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    op = build_poisson_op(g, bcs)
    r = np.random.default_rng(0)
    b = r.normal(size=g.shape)
    b -= b.mean()  # compatible RHS for the singular pure-Neumann problem
    return g, op, jnp.asarray(b, g.dtype)


def test_pure_neumann_is_singular(neumann_setup):
    g, op, b = neumann_setup
    assert op.singular
    ones = jnp.ones(g.shape, g.dtype)
    np.testing.assert_allclose(np.asarray(apply_A(op, ones)), 0.0, atol=1e-4)


@pytest.mark.parametrize("method", METHODS)
def test_solvers_reach_fixed_residual(neumann_setup, method):
    g, op, b = neumann_setup
    cfg = PoissonConfig(method=method, tol=1e-5, max_iters=20000)
    p0 = jnp.zeros(g.shape, g.dtype)
    p, iters, res = solve_poisson(op, b, p0, g, cfg)
    assert float(res) <= 1.1e-5, (method, float(res), int(iters))
    # residual recomputed from scratch agrees
    bn = float(jnp.sqrt(jnp.sum(b * b)))
    assert float(residual_norm(op, p, deflate(op, b))) / bn <= 2e-5


def test_all_methods_same_fixed_point(neumann_setup):
    g, op, b = neumann_setup
    sols = {}
    iters = {}
    # tol 1e-5: over-relaxed SOR hits its float32 roundoff floor near 2e-6,
    # so 1e-6 is unreachable for it in single precision.
    for m in METHODS:
        cfg = PoissonConfig(method=m, tol=1e-5, max_iters=50000)
        p, k, _ = solve_poisson(op, b, jnp.zeros(g.shape, g.dtype), g, cfg)
        sols[m] = np.asarray(deflate(op, p))
        iters[m] = int(k)
    for m in METHODS[1:]:
        np.testing.assert_allclose(sols[m], sols["jacobi"], atol=5e-4)
    assert iters["cg"] < iters["jacobi"], iters
    assert iters["sor"] < iters["jacobi"], iters


def test_dirichlet_dense_crosscheck():
    """Outflow face => non-singular; compare against a dense numpy solve."""
    g = GridSpec(shape=(10, 6), lengths=(1.0, 0.6))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    op = build_poisson_op(g, bcs)
    assert not op.singular
    n = g.num_cells()
    # Build dense A column by column through the matrix-free operator.
    eye = np.eye(n)
    A = np.zeros((n, n))
    for j in range(n):
        e = jnp.asarray(eye[:, j].reshape(g.shape), g.dtype)
        A[:, j] = np.asarray(apply_A(op, e)).ravel()
    r = np.random.default_rng(1)
    b = r.normal(size=n)
    p_dense = np.linalg.solve(A, b).reshape(g.shape)
    for m in METHODS:
        cfg = PoissonConfig(method=m, tol=1e-6, max_iters=100000)
        p, k, res = solve_poisson(
            op, jnp.asarray(b.reshape(g.shape), g.dtype),
            jnp.zeros(g.shape, g.dtype), g, cfg,
        )
        np.testing.assert_allclose(np.asarray(p), p_dense, atol=2e-3,
                                   err_msg=f"method={m}")


def test_obstacle_masked_operator():
    g = GridSpec(shape=(12, 12), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    solid[4:8, 4:8] = True
    op = build_poisson_op(g, bcs, solid)
    r = np.random.default_rng(2)
    b = r.normal(size=g.shape)
    b[solid] = 0.0
    cfg = PoissonConfig(method="cg", tol=1e-7, max_iters=10000)
    p, k, res = solve_poisson(
        op, jnp.asarray(b, g.dtype), jnp.zeros(g.shape, g.dtype), g, cfg
    )
    p = np.asarray(p)
    assert np.all(p[solid] == 0.0)
    assert float(res) < 1e-6
    # A p = b holds on fluid cells
    Ap = np.asarray(apply_A(op, jnp.asarray(p, g.dtype)))
    np.testing.assert_allclose(Ap[~solid], b[~solid], atol=2e-2)


def test_sor_auto_omega_beats_gs(neumann_setup):
    g, op, b = neumann_setup
    p0 = jnp.zeros(g.shape, g.dtype)
    _, k_gs, _ = solve_poisson(op, b, p0, g, PoissonConfig("gs", 1e-5, 20000))
    _, k_sor, _ = solve_poisson(op, b, p0, g, PoissonConfig("sor", 1e-5, 20000))
    assert int(k_sor) < int(k_gs)


def test_multigrid_matches_cg_with_obstacle():
    from navierstokessolver_tpu.ops.multigrid import MGPoissonSolver

    g = GridSpec(shape=(64, 32), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    solid[20:28, 12:20] = True
    op = build_poisson_op(g, bcs, solid)
    mg = MGPoissonSolver.build(g, bcs, solid)
    assert len(mg.ops) >= 3  # actually coarsened
    r = np.random.default_rng(0)
    b = jnp.asarray((r.normal(size=g.shape) * ~solid).astype(np.float32))
    # This problem's float32 residual floor wanders around 8e-6..1.2e-5;
    # the V-cycle loop's stagnation detector stops at the floor rather than
    # grinding max_cycles hoping for a lucky dip below tol.
    p_mg, cycles, res = mg.solve(b, jnp.zeros(g.shape, g.dtype), 1e-5, 100)
    assert float(res) < 2e-5
    assert int(cycles) < 25, int(cycles)
    p_cg, it_cg, _ = solve_poisson(
        op, b, jnp.zeros(g.shape, g.dtype), g, PoissonConfig("cg", 1e-7, 20000)
    )
    np.testing.assert_allclose(np.asarray(p_mg), np.asarray(p_cg), atol=2e-4)
    # MG cycles are far fewer than CG iterations (each cycle ~6 sweeps)
    assert int(cycles) * 6 < int(it_cg)


def test_multigrid_singular_cavity():
    from navierstokessolver_tpu.ops.multigrid import MGPoissonSolver

    g = GridSpec(shape=(32, 32), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    mg = MGPoissonSolver.build(g, bcs)
    op = build_poisson_op(g, bcs)
    r = np.random.default_rng(1)
    b = r.normal(size=g.shape).astype(np.float32)
    b -= b.mean()
    p, cycles, res = mg.solve(jnp.asarray(b), jnp.zeros(g.shape, g.dtype), 1e-5, 60)
    assert float(res) < 1e-5
    assert int(cycles) < 30


def test_mg_end_to_end_cylinder_smoke():
    from navierstokessolver_tpu.cases import make_case

    case = make_case(
        "cylinder", shape=(96, 48), lengths=(12.0, 6.0), center=(3.0, 3.01),
        poisson_method="mg",
    )
    st = case.initial_state()
    st, diag = case.sim.run_scan(st, 20)
    assert float(diag.max_div[-1]) < 1e-3
    assert np.isfinite(np.asarray(st.p)).all()


def test_mgcg_obstacle_beats_plain_mg_floor():
    """MG-preconditioned flexible CG: same fixed point as CG, converges in
    few iterations on the obstacle+outflow problem, and keeps converging
    below the plain-MG stagnation region."""
    from navierstokessolver_tpu.ops.multigrid import MGPoissonSolver

    g = GridSpec(shape=(64, 32), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    solid[20:28, 12:20] = True
    op = build_poisson_op(g, bcs, solid)
    mg = MGPoissonSolver.build(g, bcs, solid)
    r = np.random.default_rng(0)
    b = jnp.asarray((r.normal(size=g.shape) * ~solid).astype(np.float32))
    # This problem's float32 residual floor sits near 1e-5 (see the plain-MG
    # test above); the no-improvement guard stops PCG at the floor.
    p, iters, res = mg.solve_pcg(b, jnp.zeros(g.shape, g.dtype), 1e-5, 100)
    assert float(res) < 2e-5
    assert int(iters) < 30, int(iters)
    p_cg, it_cg, _ = solve_poisson(
        op, b, jnp.zeros(g.shape, g.dtype), g, PoissonConfig("cg", 1e-7, 20000)
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_cg), atol=2e-4)
    # Krylov acceleration: far fewer iterations than unpreconditioned CG.
    assert int(iters) * 10 < int(it_cg)


def test_mgcg_singular_cavity():
    from navierstokessolver_tpu.ops.multigrid import MGPoissonSolver

    g = GridSpec(shape=(32, 32), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    op = build_poisson_op(g, bcs)
    mg = MGPoissonSolver.build(g, bcs)
    r = np.random.default_rng(1)
    b = r.normal(size=g.shape).astype(np.float32)
    b -= b.mean()
    p, iters, res = mg.solve_pcg(
        jnp.asarray(b), jnp.zeros(g.shape, g.dtype), 1e-6, 60
    )
    assert float(res) < 1e-6
    assert int(iters) < 15
    # solution is deflated (mean-zero over fluid) like every other solver
    assert abs(float(jnp.mean(p))) < 1e-6


def test_mgcg_end_to_end_cylinder_smoke():
    from navierstokessolver_tpu.cases import make_case

    case = make_case(
        "cylinder", shape=(96, 48), lengths=(12.0, 6.0), center=(3.0, 3.01),
        poisson_method="mgcg",
    )
    st = case.initial_state()
    st, diag = case.sim.run_scan(st, 20)
    assert float(diag.max_div[-1]) < 1e-3
    assert np.isfinite(np.asarray(st.p)).all()


def test_cg_anisotropic_breakdown_stays_finite():
    """Advisor-class robustness (round 5): on a strongly anisotropic
    operator with tol at/below the f32 floor, the CG search direction
    can round to NEGATIVE curvature (d.Ad < 0); the old max(dAd, 1e-30)
    clamp then exploded alpha to ~1e30 and the fields went NaN with the
    while_loop exiting on the NaN compare. The breakdown guard must
    take no step, stop, and report a finite (floor-level) residual."""
    g = GridSpec(shape=(64, 16, 16), lengths=(1.0, 1.0, 1.0))  # 16:1 h
    bcs = no_slip_box(g)
    op = build_poisson_op(g, bcs)
    r = np.random.default_rng(1)
    b = r.standard_normal(g.shape).astype(np.float32)
    b -= b.mean()
    b = jnp.asarray(b, g.dtype)
    cfg = PoissonConfig(method="cg", tol=1e-9, max_iters=5000)  # << floor
    p, iters, res = solve_poisson(op, b, jnp.zeros(g.shape, g.dtype),
                                  g, cfg)
    assert np.isfinite(np.asarray(p)).all()
    assert np.isfinite(float(res))
    # it actually solved the system to the f32 floor's order, not junk
    bn = float(jnp.sqrt(jnp.sum(b * b)))
    assert float(residual_norm(op, p, deflate(op, b))) / bn < 1e-4
