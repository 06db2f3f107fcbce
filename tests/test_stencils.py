"""Unit tests for staggered-grid stencils (SURVEY.md SS4 Unit tier)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec, no_slip_box
from navierstokessolver_tpu.bcs import BCSpec
from navierstokessolver_tpu.ops import stencils


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.fixture(scope="module")
def grid2d():
    return GridSpec(shape=(16, 24), lengths=(1.0, 1.5))


def random_velocity(grid, zero_boundary=False, seed=0):
    r = rng(seed)
    u = []
    for a in range(grid.ndim):
        arr = r.normal(size=grid.face_shape(a))
        if zero_boundary:
            sl = [slice(None)] * grid.ndim
            sl[a] = 0
            arr[tuple(sl)] = 0.0
            sl[a] = -1
            arr[tuple(sl)] = 0.0
        u.append(jnp.asarray(arr, grid.dtype))
    return tuple(u)


def test_divergence_linear_field(grid2d):
    """div(ax, by) = a + b exactly for linear fields."""
    g = grid2d
    a, b = 1.7, -0.6
    x = np.asarray(g.face_coords(0))
    y = np.asarray(g.face_coords(1))
    u = jnp.asarray(np.broadcast_to((a * x)[:, None], g.face_shape(0)), g.dtype)
    v = jnp.asarray(np.broadcast_to((b * y)[None, :], g.face_shape(1)), g.dtype)
    div = stencils.divergence(g, (u, v))
    np.testing.assert_allclose(np.asarray(div), a + b, rtol=1e-4)


def test_gradient_divergence_adjoint(grid2d):
    """Summation by parts: <grad p, u>_faces = -<p, div u>_cells
    when boundary-normal velocity vanishes (discrete adjoint identity)."""
    g = grid2d
    r = rng(3)
    p = jnp.asarray(r.normal(size=g.shape), g.dtype)
    u = random_velocity(g, zero_boundary=True, seed=4)
    h = g.spacing
    vol = h[0] * h[1]
    lhs = 0.0
    for a in range(2):
        gp = stencils.pressure_gradient(g, p, a)
        sl = [slice(None)] * 2
        sl[a] = slice(1, -1)
        lhs += jnp.sum(gp * u[a][tuple(sl)]) * vol
    rhs = -jnp.sum(p * stencils.divergence(g, u)) * vol
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_uniform_field_has_zero_rhs(grid2d):
    """Constant velocity matching constant-velocity walls: adv = lap = 0."""
    g = grid2d
    c = (0.8, -0.3)
    bcs = {(a, s): BCSpec.wall(c) for a in range(2) for s in (0, 1)}
    u = tuple(
        jnp.full(g.face_shape(a), c[a], dtype=g.dtype) for a in range(2)
    )
    for comp in range(2):
        lap = stencils.laplacian_component(g, bcs, comp, u[comp])
        np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-4)
        adv = stencils.advection_component(g, bcs, u, comp)
        np.testing.assert_allclose(np.asarray(adv), 0.0, atol=1e-4)


def test_laplacian_quadratic_interior(grid2d):
    """lap(x^2 + y^2) = 4 exactly for the 5-point stencil (interior)."""
    g = grid2d
    bcs = no_slip_box(g)
    x = np.asarray(g.face_coords(0))
    y = np.asarray(g.cell_centers(1))
    f = x[:, None] ** 2 + y[None, :] ** 2
    u = jnp.asarray(np.broadcast_to(f, g.face_shape(0)), g.dtype)
    lap = stencils.laplacian_component(g, bcs, 0, u)
    # Ghost rows along y are BC-contaminated; check interior columns only.
    np.testing.assert_allclose(np.asarray(lap)[:, 1:-1], 4.0, rtol=1e-3)


def test_advection_uniform_transport(grid2d):
    """(c . grad) applied to a linear u-profile gives c_x * slope."""
    g = grid2d
    cx = 0.7
    bcs = {(a, s): BCSpec.wall((cx, 0.0)) for a in range(2) for s in (0, 1)}
    slope = 1.3
    x = np.asarray(g.face_coords(0))
    u = jnp.asarray(
        np.broadcast_to((cx + 0.0 * x)[:, None], g.face_shape(0)), g.dtype
    )
    # linear in x: u = slope * x
    u_lin = jnp.asarray(
        np.broadcast_to((slope * x)[:, None], g.face_shape(0)), g.dtype
    )
    v = jnp.zeros(g.face_shape(1), g.dtype)
    # transport velocity is u_lin itself => adv = u * du/dx = slope^2 x
    adv = stencils.advection_component(g, bcs, (u_lin, v), 0)
    expect = (slope * slope * x[1:-1])[:, None]
    np.testing.assert_allclose(
        np.asarray(adv)[:, 1:-1], np.broadcast_to(expect, adv.shape)[:, 1:-1],
        rtol=1e-3, atol=1e-5,
    )


def test_upwind_blend_matches_central_for_smooth(grid2d):
    g = grid2d
    bcs = no_slip_box(g)
    u = random_velocity(g, seed=9)
    a0 = stencils.advection_component(g, bcs, u, 0, upwind_gamma=0.0)
    a1 = stencils.advection_component(g, bcs, u, 0, upwind_gamma=1.0)
    # They differ in general (upwind adds dissipation) but stay finite/close in norm.
    assert np.isfinite(np.asarray(a1)).all()
    assert np.linalg.norm(np.asarray(a1)) < 10 * np.linalg.norm(np.asarray(a0)) + 1.0


def test_3d_divergence_and_predictor_shapes():
    g = GridSpec(shape=(8, 10, 12), lengths=(1.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    u = random_velocity(g, seed=1)
    div = stencils.divergence(g, u)
    assert div.shape == g.shape
    out = stencils.predictor(g, bcs, u, dt=1e-3, nu=0.1)
    for a in range(3):
        assert out[a].shape == g.face_shape(a)
        assert np.isfinite(np.asarray(out[a])).all()


def test_vorticity_shear():
    g = GridSpec(shape=(16, 16), lengths=(1.0, 1.0))
    # u = y  => omega = -du/dy = -1
    y = np.asarray(g.cell_centers(1))
    u = jnp.asarray(np.broadcast_to(y[None, :], g.face_shape(0)), g.dtype)
    v = jnp.zeros(g.face_shape(1), g.dtype)
    w = stencils.vorticity_2d(g, (u, v))
    np.testing.assert_allclose(np.asarray(w), -1.0, rtol=1e-4)


def test_vorticity_magnitude_3d_solid_rotation():
    """Analytic check: u = (-y, x, 0) (solid-body rotation about z) has
    curl = (0, 0, 2) everywhere -> |curl| = 2 at every node."""
    from navierstokessolver_tpu.ops.stencils import vorticity_magnitude_3d

    g = GridSpec(shape=(8, 10, 6), lengths=(1.0, 1.0, 1.0))
    hx, hy, hz = g.spacing
    # staggered sampling of the rotation field
    yc = (np.arange(10) + 0.5) * hy
    xc = (np.arange(8) + 0.5) * hx
    u0 = jnp.asarray(np.broadcast_to(-yc[None, :, None], (9, 10, 6)),
                     jnp.float32)
    u1 = jnp.asarray(np.broadcast_to(xc[:, None, None], (8, 11, 6)),
                     jnp.float32)
    u2 = jnp.zeros((8, 10, 7), jnp.float32)
    w = vorticity_magnitude_3d(g, (u0, u1, u2))
    assert w.shape == (7, 9, 5)
    np.testing.assert_allclose(np.asarray(w), 2.0, rtol=1e-5)


def test_streamfunction_consistency():
    """psi's x-differences reproduce -v wherever div u = 0 (MAC-exact), and
    psi vanishes on the solid left/bottom boundaries of the cavity."""
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.ops.stencils import streamfunction_2d

    case = make_case("cavity", shape=(24, 24))
    st, d = case.sim.run_scan(case.initial_state(), 200)
    g = case.sim.grid
    psi = np.asarray(streamfunction_2d(g, st.u))
    assert psi.shape == (g.shape[0] + 1, g.shape[1] + 1)
    np.testing.assert_allclose(psi[0, :], 0.0, atol=1e-7)
    np.testing.assert_allclose(psi[:, 0], 0.0, atol=1e-7)
    dx = g.spacing[0]
    v = np.asarray(st.u[1])
    got_v = -(psi[1:, :] - psi[:-1, :]) / dx  # (nx, ny+1)
    # holds to the projection tolerance (max_div ~ 1e-5 * dy accumulation)
    np.testing.assert_allclose(got_v, v, atol=5e-5)


def test_q_criterion_oracles():
    """Solid-body rotation has Q = 1 (pure rotation, omega=2 => Q =
    omega^2/4... with u=(-y, x, 0): Q = 1); pure shear u=(y,0,0) has
    Q = 0 (rotation and strain cancel)."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.stencils import q_criterion_3d

    g = GridSpec(shape=(16, 16, 8), lengths=(2.0, 2.0, 1.0))

    def face_coords(a):
        # coordinates of the a-faces in every axis (face along a, centers
        # elsewhere)
        axes = []
        for c in range(3):
            n = g.shape[c] + (1 if c == a else 0)
            h = g.spacing[c]
            off = 0.0 if c == a else 0.5
            axes.append((jnp.arange(n) + off) * h)
        return jnp.meshgrid(*axes, indexing="ij")

    xu, yu, _ = face_coords(0)
    xv, yv, _ = face_coords(1)
    _, _, zw = face_coords(2)

    # solid-body rotation about z through the domain center
    cx, cy = 1.0, 1.0
    u_rot = (-(yu - cy), (xv - cx), jnp.zeros_like(zw))
    q = q_criterion_3d(g, u_rot)
    interior = q[2:-2, 2:-2, 2:-2]
    assert jnp.allclose(interior, 1.0, atol=1e-4), float(interior.mean())

    # pure shear
    u_shear = (yu, jnp.zeros_like(xv), jnp.zeros_like(zw))
    q2 = q_criterion_3d(g, u_shear)
    assert jnp.abs(q2[2:-2, 2:-2, 2:-2]).max() < 1e-5
