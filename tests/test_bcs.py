"""Unit tests for boundary-condition application (SURVEY.md SS4 Unit tier)."""

import jax.numpy as jnp
import numpy as np

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import (
    BCSpec,
    apply_velocity_bcs,
    correction_face_masks,
    face_masks_from_solid,
    no_slip_box,
    pad_transverse,
)


def grid():
    return GridSpec(shape=(8, 6), lengths=(1.0, 1.0))


def test_wall_sets_normal_dof_and_lid_ghost():
    g = grid()
    bcs = no_slip_box(g)
    bcs[(1, 1)] = BCSpec.wall((1.0, 0.0))  # moving lid on top
    u = jnp.ones(g.face_shape(0), g.dtype)
    v = jnp.ones(g.face_shape(1), g.dtype)
    uu, vv = apply_velocity_bcs(g, bcs, (u, v))
    assert np.all(np.asarray(uu)[0, :] == 0.0)
    assert np.all(np.asarray(uu)[-1, :] == 0.0)
    assert np.all(np.asarray(vv)[:, 0] == 0.0)
    assert np.all(np.asarray(vv)[:, -1] == 0.0)
    # lid ghost for u (interior faces; corners see the normal-wall zeros):
    # 2*U_lid - edge = 2*1 - 1 = 1
    padded = pad_transverse(g, bcs, 0, uu)
    np.testing.assert_allclose(np.asarray(padded)[1:-1, -1], 2.0 * 1.0 - 1.0)
    # bottom wall ghost: 2*0 - edge = -1
    np.testing.assert_allclose(np.asarray(padded)[1:-1, 0], -1.0)


def test_outflow_zero_gradient():
    g = grid()
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.outflow()
    r = np.random.default_rng(0)
    u = jnp.asarray(r.normal(size=g.face_shape(0)), g.dtype)
    v = jnp.asarray(r.normal(size=g.face_shape(1)), g.dtype)
    uu, vv = apply_velocity_bcs(g, bcs, (u, v))
    np.testing.assert_allclose(np.asarray(uu)[-1, :], np.asarray(uu)[-2, :])
    # outflow ghost for v is copy of edge
    padded = pad_transverse(g, bcs, 1, vv)
    np.testing.assert_allclose(np.asarray(padded)[-1, :], np.asarray(padded)[-2, :])


def test_inflow_profile():
    g = grid()
    profile = jnp.linspace(0.0, 1.0, g.shape[1])
    bcs = no_slip_box(g)
    bcs[(0, 0)] = BCSpec.inflow((profile, 0.0))
    u = jnp.zeros(g.face_shape(0), g.dtype)
    v = jnp.zeros(g.face_shape(1), g.dtype)
    uu, _ = apply_velocity_bcs(g, bcs, (u, v))
    np.testing.assert_allclose(np.asarray(uu)[0, :], np.asarray(profile))


def test_slip_normal_zero_tangential_free():
    g = grid()
    bcs = no_slip_box(g)
    bcs[(1, 0)] = BCSpec.slip()
    r = np.random.default_rng(1)
    u = jnp.asarray(r.normal(size=g.face_shape(0)), g.dtype)
    v = jnp.asarray(r.normal(size=g.face_shape(1)), g.dtype)
    uu, vv = apply_velocity_bcs(g, bcs, (u, v))
    assert np.all(np.asarray(vv)[:, 0] == 0.0)  # normal blocked
    padded = pad_transverse(g, bcs, 0, uu)
    # tangential zero-gradient at slip wall
    np.testing.assert_allclose(np.asarray(padded)[:, 0], np.asarray(padded)[:, 1])


def test_obstacle_face_masks():
    g = grid()
    solid = np.zeros(g.shape, bool)
    solid[3:5, 2:4] = True
    masks = face_masks_from_solid(g, solid)
    mu, mv = (np.asarray(m) for m in masks)
    # Faces straddling solid cells are blocked.
    assert mu[3, 2] == 0 and mu[4, 2] == 0 and mu[5, 2] == 0
    assert mu[2, 2] == 1 and mu[6, 2] == 1
    assert mv[3, 2] == 0 and mv[3, 4] == 0
    # Correction masks: only fluid-fluid faces correct.
    cu, cv = (np.asarray(m) for m in correction_face_masks(g, solid))
    assert cu.shape == (g.shape[0] - 1, g.shape[1])
    assert cu[2, 2] == 0  # face between fluid (2,2) and solid (3,2)
    assert cu[0, 0] == 1


def test_convective_outlet_update():
    """Once-per-step convective update: the boundary-normal DOF relaxes
    toward the corrected inner face at rate C = U dt / h (clamped to 1)."""
    import jax.numpy as jnp
    from navierstokessolver_tpu.bcs import (
        BCSpec, apply_convective_outlets, no_slip_box,
    )
    from navierstokessolver_tpu.grid import GridSpec, zero_state

    g = GridSpec(shape=(8, 6), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.convective(2.0)
    st = zero_state(g)
    u_old = (st.u[0].at[-1, :].set(1.0), st.u[1])
    u_new = (st.u[0].at[-2, :].set(0.5), st.u[1])
    dt = 0.02
    out = apply_convective_outlets(g, bcs, u_new, u_old, dt)
    c = 2.0 * dt / g.spacing[0]     # = 0.32
    expected = 1.0 - c * (1.0 - 0.5)
    np.testing.assert_allclose(np.asarray(out[0][-1, :]), expected, rtol=1e-6)
    # other faces untouched
    np.testing.assert_allclose(np.asarray(out[0][0, :]), 0.0)
