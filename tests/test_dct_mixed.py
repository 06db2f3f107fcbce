"""Mixed-BC spectral bases and the DCT-preconditioned CG.

Covers the round-2 extension of the direct spectral solver to outflow
(pressure-Dirichlet) faces -- DCT-IV / flipped DCT-IV / DST-II axes -- and
the ``dctcg`` solver that uses the exact unmasked spectral inverse as a CG
preconditioner on obstacle topologies (VERDICT r1 item 5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.ops import dct
from navierstokessolver_tpu.ops.fft_poisson import (
    DCTPCGSolver,
    DCTPoissonSolver,
    axis_kinds_from_bcs,
    solve_with_residual,
)
from navierstokessolver_tpu.ops.poisson import (
    PoissonConfig,
    apply_A,
    build_poisson_op,
    solve_poisson,
)


def _op1d(n, h, lo_dirichlet, hi_dirichlet):
    """Dense 1D cell-centered second-difference operator matching
    ops/poisson.build_poisson_op's ghost conventions."""
    A = np.zeros((n, n))
    w = 1.0 / (h * h)
    for i in range(n):
        d = 0.0
        if i > 0:
            A[i, i - 1] = w
            d -= w
        if i < n - 1:
            A[i, i + 1] = w
            d -= w
        if i == 0 and lo_dirichlet:
            d -= 2 * w
        if i == n - 1 and hi_dirichlet:
            d -= 2 * w
        A[i, i] = d
    return A


@pytest.mark.parametrize("n", [5, 8, 16])
def test_mixed_bases_diagonalize_exactly(n):
    h = 0.13
    # Neumann/Dirichlet -> DCT-IV (orthonormal, symmetric, self-inverse)
    C = dct.dct4_matrix(n)
    lam = dct.mixed_nd_eigenvalues(n, h)
    A = _op1d(n, h, False, True)
    assert np.allclose(C @ C.T, np.eye(n), atol=1e-12)
    assert np.allclose(C, C.T, atol=1e-12)
    assert np.allclose(C @ A @ C.T, np.diag(lam), atol=1e-10)
    # Dirichlet/Neumann -> index-flipped DCT-IV, same eigenvalues
    F = C[:, ::-1]
    A = _op1d(n, h, True, False)
    assert np.allclose(F @ A @ F.T, np.diag(lam), atol=1e-10)
    # Dirichlet/Dirichlet -> DST-II
    S = dct.dst2_matrix(n)
    lam = dct.dirichlet_eigenvalues(n, h)
    A = _op1d(n, h, True, True)
    assert np.allclose(S @ S.T, np.eye(n), atol=1e-12)
    assert np.allclose(S @ A @ S.T, np.diag(lam), atol=1e-10)


@pytest.mark.parametrize("flipped", [False, True])
@pytest.mark.parametrize("n", [8, 64, 512])
def test_dct4_split_plan_matches_dense(n, flipped):
    """Dct4SplitPlan forward/inverse == the dense orthonormal DCT-IV
    (index-flipped for 'dn'), block order unwound by permutation()."""
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)
    plan = dct.Dct4SplitPlan(n, jnp.float32, flipped=flipped)
    C = dct.dct4_matrix(n)
    if flipped:
        C = C[:, ::-1]
    hi = jax.lax.Precision.HIGHEST
    dense = jnp.tensordot(jnp.asarray(C, jnp.float32), x,
                          axes=([1], [0]), precision=hi)
    got = plan.apply_fwd(x, 0, hi)
    perm = plan.permutation()
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense)[perm], atol=2e-5
    )
    back = plan.apply_inv(got, 0, hi)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-5)
    # axis=1 application too (the runtime uses both orientations)
    x2 = jnp.asarray(rng.normal(size=(5, n)), jnp.float32)
    got2 = plan.apply_fwd(x2, 1, hi)
    dense2 = jnp.tensordot(jnp.asarray(C, jnp.float32), x2,
                           axes=([1], [1]), precision=hi)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(dense2)[perm], atol=2e-5
    )
    back2 = plan.apply_inv(got2, 0, hi)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(x2).T, atol=2e-5)


def test_axis_kinds_from_bcs():
    g = GridSpec(shape=(8, 8), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    assert axis_kinds_from_bcs(g, bcs) == ("nn", "nn")
    bcs[(0, 1)] = BCSpec.outflow()
    assert axis_kinds_from_bcs(g, bcs) == ("nd", "nn")
    bcs[(0, 0)] = BCSpec.outflow()
    assert axis_kinds_from_bcs(g, bcs) == ("dd", "nn")
    bcs[(0, 0)] = BCSpec.wall()
    bcs = no_slip_box(g)
    bcs[(1, 0)] = BCSpec.outflow()
    assert axis_kinds_from_bcs(g, bcs) == ("nn", "dn")


@pytest.mark.parametrize(
    "faces",
    [
        [((0, 1), "outflow")],                        # nd axis
        [((0, 0), "outflow")],                        # dn axis
        [((0, 0), "outflow"), ((0, 1), "outflow")],   # dd axis
        [((0, 1), "outflow"), ((1, 0), "outflow")],   # nd + dn
    ],
)
def test_direct_solve_outflow_is_exact(faces):
    """Outflow domains (no obstacle) now solve in ONE direct application:
    manufactured solution recovered through the nonsingular operator, no
    deflation anywhere (the solution's mean is part of the answer)."""
    g = GridSpec(shape=(24, 16), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    for face, kind in faces:
        bcs[face] = BCSpec.outflow()
    op = build_poisson_op(g, bcs)
    assert not op.singular
    rng = np.random.default_rng(3)
    p_true = jnp.asarray(rng.normal(size=g.shape), g.dtype)
    b = apply_A(op, p_true)
    solver = DCTPoissonSolver.build(
        g, kinds=axis_kinds_from_bcs(g, bcs)
    )
    assert not solver.singular
    p, iters, res = solve_with_residual(solver, op, b)
    assert int(iters) == 1
    # f32 transform + one refinement pass; the MEAN must match too
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(p_true), atol=5e-3
    )
    assert float(res) < 1e-3


def test_dctcg_matches_cg_on_obstacle_topology():
    """dctcg's converged solution equals plain CG's on a cylinder-like
    masked operator, with far fewer iterations (the whole point)."""
    g = GridSpec(shape=(48, 24), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    yy, xx = np.meshgrid(np.arange(24), np.arange(48), indexing="ij")
    solid[((xx.T - 12) ** 2 + (yy.T - 12) ** 2) < 9] = True
    op = build_poisson_op(g, bcs, solid)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.normal(size=g.shape), g.dtype) * op.fluid
    p0 = jnp.zeros(g.shape, g.dtype)

    pcg = DCTPCGSolver.build(g, bcs)
    p_a, it_a, res_a = pcg.solve(b, p0, 1e-8, 500, op=op)
    p_b, it_b, res_b = solve_poisson(
        op, b, p0, g, PoissonConfig(method="cg", tol=1e-8, max_iters=2000)
    )
    assert float(res_a) < 1e-6
    assert float(res_b) < 1e-6
    np.testing.assert_allclose(
        np.asarray(p_a), np.asarray(p_b), atol=2e-4,
        err_msg="dctcg and cg disagree on the converged pressure",
    )
    assert int(it_a) < int(it_b) / 3, (
        f"spectral preconditioning should slash iterations "
        f"(dctcg {int(it_a)} vs cg {int(it_b)})"
    )


def test_capacitance_preconditioner_is_near_exact():
    """With the Woodbury cut-link correction the preconditioned solve
    needs only a handful of iterations even at tight tolerance, and far
    fewer than the uncorrected spectral preconditioner."""
    g = GridSpec(shape=(48, 24), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    xx, yy = np.meshgrid(np.arange(48), np.arange(24), indexing="ij")
    solid[((xx - 12) ** 2 + (yy - 12) ** 2) < 9] = True
    op = build_poisson_op(g, bcs, solid)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.normal(size=g.shape), g.dtype) * op.fluid
    p0 = jnp.zeros(g.shape, g.dtype)

    cap = DCTPCGSolver.build(g, bcs, solid)
    assert cap.cap_cinv is not None
    nocap = DCTPCGSolver.build(g, bcs, solid, capacitance=False)
    assert nocap.cap_cinv is None
    # Richardson sweeps stop at the f32 residual floor (mg-style
    # stagnation bail), so ask for a reachable tolerance.
    p_c, it_c, res_c = cap.solve(b, p0, 5e-6, 100, op=op)
    p_n, it_n, res_n = nocap.solve(b, p0, 5e-6, 100, op=op)
    assert float(res_c) < 5e-6
    assert int(it_c) <= 5, int(it_c)
    assert int(it_c) < int(it_n)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_n), atol=1e-4)


def test_capacitance_handles_periodic_axis_links():
    """Obstacle butted against a periodic wrap: cut links across the seam
    must be found via the rolled neighbor masks. (y gets an outflow face
    so the unmasked operator is nonsingular -- the capacitance correction
    is gated on that.)"""
    g = GridSpec(shape=(32, 16), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 0)] = BCSpec.periodic()
    bcs[(0, 1)] = BCSpec.periodic()
    bcs[(1, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    solid[30:, 6:10] = True
    solid[:2, 6:10] = True          # wraps across x = 0
    op = build_poisson_op(g, bcs, solid)
    s = DCTPCGSolver.build(g, bcs, solid)
    assert s.cap_cinv is not None
    # the wrap seam contributes link columns: fluid(31, y) | solid(0, y)
    # pairs exist only if the roll-based search saw them
    ia = np.asarray(s.cap_idx_a)
    ib = np.asarray(s.cap_idx_b)
    seam = set(zip(ia.tolist(), ib.tolist()))
    flat = np.arange(32 * 16).reshape(32, 16)
    assert any(
        (int(flat[2, y]), int(flat[1, y])) in seam for y in range(6, 10)
    )
    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.normal(size=g.shape), g.dtype) * op.fluid
    p0 = jnp.zeros(g.shape, g.dtype)
    p, it, res = s.solve(b, p0, 1e-6, 100, op=op)
    assert float(res) < 1e-5


def test_spectral_correction_matches_box_path():
    """The fused-in-spectral-domain Woodbury correction (one transform
    chain + thin point matmuls) computes the same preconditioner action
    as the generic two-solve dense-box path."""
    g = GridSpec(shape=(64, 32), lengths=(2.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    xx, yy = np.meshgrid(np.arange(64), np.arange(32), indexing="ij")
    solid[((xx - 16) ** 2 + (yy - 16) ** 2) < 20] = True
    op = build_poisson_op(g, bcs, solid)
    spec = DCTPCGSolver.build(g, bcs, solid)
    box = DCTPCGSolver.build(g, bcs, solid, spectral=False)
    assert spec.cap_vx is not None and spec.cap_wbox is None
    assert box.cap_vx is None and box.cap_wbox is not None
    rng = np.random.default_rng(23)
    r = jnp.asarray(rng.normal(size=g.shape), g.dtype) * op.fluid
    za = np.asarray(spec._precond_apply(r, op.fluid))
    zb = np.asarray(box._precond_apply(r, op.fluid))
    scale = np.abs(zb).max()
    np.testing.assert_allclose(za, zb, atol=2e-5 * scale)


def test_capacitance_3d_sphere():
    """The cut-link construction is rank-generic: a 3D sphere obstacle in
    an outflow box solves to tight tolerance in a handful of iterations."""
    g = GridSpec(shape=(24, 16, 16), lengths=(1.5, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    solid = np.zeros(g.shape, bool)
    xx, yy, zz = np.meshgrid(
        np.arange(24), np.arange(16), np.arange(16), indexing="ij"
    )
    solid[((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 8) ** 2) < 16] = True
    op = build_poisson_op(g, bcs, solid)
    s = DCTPCGSolver.build(g, bcs, solid)
    assert s.cap_cinv is not None
    rng = np.random.default_rng(17)
    b = jnp.asarray(rng.normal(size=g.shape), g.dtype) * op.fluid
    p0 = jnp.zeros(g.shape, g.dtype)
    p, it, res = s.solve(b, p0, 5e-6, 100, op=op)
    assert float(res) < 5e-6
    assert int(it) <= 5, int(it)
    # cross-check against plain CG
    p_cg, _, _ = solve_poisson(
        op, b, p0, g, PoissonConfig(method="cg", tol=1e-8, max_iters=5000)
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_cg), atol=2e-4)


def test_dctcg_simulation_matches_mg():
    """Full cylinder simulation: dctcg trajectory tracks mg's."""
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

    fields = {}
    for m in ("mg", "dctcg"):
        case = make_case("cylinder", shape=(64, 32), poisson_method=m)
        st = impulsive_start_state(case.sim)
        st, d = case.sim.run_scan(st, 40)
        assert np.isfinite(np.asarray(st.u[0])).all()
        fields[m] = np.asarray(st.u[0])
    ref = np.abs(fields["mg"]).max()
    assert np.abs(fields["mg"] - fields["dctcg"]).max() < 5e-3 * ref


def test_channel_fft_direct_runs():
    """Channel (inflow/outflow) with the DIRECT spectral solver: one
    application per step, projection keeps divergence at f32 noise."""
    case = make_case("channel", shape=(48, 24), poisson_method="fft")
    st = case.sim.initial_state()
    st, d = case.sim.run_scan(st, 30)
    assert float(d.max_div[-1]) < 1e-4
    assert np.isfinite(np.asarray(st.p)).all()
