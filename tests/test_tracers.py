"""Lagrangian tracers (tracers.py).

Ladder: interpolation exactness on (multi)linear fields -> advection
exactness on uniform flow -> periodic wrap -> analytic Taylor-Green orbits
(tracers circulate, stay in their vortex cell) -> in-scan integration
equals the eager hand loop (to the last-ulp fusion differences).
"""

import math

import jax.numpy as jnp
import numpy as np

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.tracers import (
    advect_tracers,
    confine,
    seed_tracers,
    velocity_at,
)


def _periodic_bcs(nd):
    return {(a, s): BCSpec.periodic() for a in range(nd) for s in (0, 1)}


def test_interpolation_exact_on_linear_field():
    # u = 2 + 3x + 4y (linear): multilinear interpolation is exact.
    n = 16
    g = GridSpec(shape=(n, n), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    dx, dy = g.spacing
    xf = np.arange(n + 1) * dx
    yc = (np.arange(n) + 0.5) * dy
    xc = (np.arange(n) + 0.5) * dx
    yf = np.arange(n + 1) * dy
    u0 = 2.0 + 3.0 * xf[:, None] + 4.0 * yc[None, :]
    u1 = -1.0 + 0.5 * xc[:, None] - 2.0 * yf[None, :]
    u = (jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32))
    rng = np.random.default_rng(0)
    # stay >= half a cell from non-periodic walls (clamping region)
    pos = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(64, 2)).astype(np.float32)
    )
    v = np.asarray(velocity_at(g, bcs, u, pos))
    p = np.asarray(pos)
    np.testing.assert_allclose(v[:, 0], 2.0 + 3.0 * p[:, 0] + 4.0 * p[:, 1],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(v[:, 1], -1.0 + 0.5 * p[:, 0] - 2.0 * p[:, 1],
                               rtol=0, atol=1e-5)


def test_uniform_flow_linear_motion_and_wrap():
    n = 8
    L = 1.0
    g = GridSpec(shape=(n, n), lengths=(L, L))
    bcs = _periodic_bcs(2)
    u = (jnp.full((n + 1, n), 0.3, jnp.float32),
         jnp.full((n, n + 1), -0.2, jnp.float32))
    pos = jnp.asarray([[0.9, 0.05], [0.5, 0.5]], jnp.float32)
    dt = 0.5
    new = np.asarray(advect_tracers(g, bcs, u, pos, dt))
    # exact linear motion with periodic wrap
    np.testing.assert_allclose(new[0], [(0.9 + 0.15) % L, (0.05 - 0.1) % L],
                               atol=1e-6)
    np.testing.assert_allclose(new[1], [0.65, 0.4], atol=1e-6)


def test_wall_clamp_keeps_tracers_inside():
    n = 8
    g = GridSpec(shape=(n, n), lengths=(1.0, 1.0))
    bcs = no_slip_box(g)
    u = (jnp.full((n + 1, n), 5.0, jnp.float32),
         jnp.full((n, n + 1), -5.0, jnp.float32))
    pos = jnp.asarray([[0.95, 0.05]], jnp.float32)
    p = pos
    for _ in range(5):
        p = advect_tracers(g, bcs, u, p, 0.1)
    p = np.asarray(p)
    assert 0.0 <= p[0, 0] <= 1.0 and 0.0 <= p[0, 1] <= 1.0


def _tg_field(n):
    L = 2.0 * math.pi
    g = GridSpec(shape=(n, n), lengths=(L, L))
    dx, dy = g.spacing
    xf = np.arange(n + 1) * dx
    yc = (np.arange(n) + 0.5) * dy
    xc = (np.arange(n) + 0.5) * dx
    yf = np.arange(n + 1) * dy
    u0 = np.sin(xf)[:, None] * np.cos(yc)[None, :]
    u1 = -np.cos(xc)[:, None] * np.sin(yf)[None, :]
    return g, (jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32))


def test_taylor_green_orbits_stay_in_cell():
    # In the steady TG field, streamlines are closed orbits inside each
    # pi x pi vortex cell; a tracer seeded inside cell (0,0) must stay
    # there (frozen velocity field, small dt).
    g, u = _tg_field(64)
    bcs = _periodic_bcs(2)
    pos = jnp.asarray([[1.2, 1.2], [2.0, 0.8], [0.7, 2.2]], jnp.float32)
    p = pos
    for _ in range(400):
        p = advect_tracers(g, bcs, u, p, 0.01)
    p = np.asarray(p)
    assert np.all(p > 0.0) and np.all(p < math.pi)
    # and the speed along the way matches the analytic field
    v = np.asarray(velocity_at(g, bcs, u, jnp.asarray(p)))
    v_exact = np.stack([
        np.sin(p[:, 0]) * np.cos(p[:, 1]),
        -np.cos(p[:, 0]) * np.sin(p[:, 1]),
    ], axis=1)
    np.testing.assert_allclose(v, v_exact, atol=5e-3)


def test_run_scan_tracers_matches_hand_loop():
    case = make_case("cavity", shape=(24, 24))
    sim = case.sim
    pos0 = seed_tracers(sim.grid, 32, seed=1)
    st, pos, diags, traj = sim.run_scan_tracers(
        case.initial_state(), pos0, 5
    )
    # hand loop: step then advect with the same dt
    st2 = case.initial_state()
    p2 = pos0
    for k in range(5):
        st2, d = sim.step(st2)
        p2 = advect_tracers(sim.grid, sim.bcs, st2.u, p2, d.dt)
        # scan-vs-eager XLA fusion differs in the last ulp
        np.testing.assert_allclose(np.asarray(traj[k]), np.asarray(p2),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(p2), atol=1e-6)
    for a in range(2):
        np.testing.assert_allclose(np.asarray(st.u[a]), np.asarray(st2.u[a]),
                                   atol=1e-6)
    assert traj.shape == (5, 32, 2)


def test_seed_and_confine_3d():
    g = GridSpec(shape=(8, 8, 8), lengths=(1.0, 2.0, 3.0))
    bcs = no_slip_box(g)
    pos = seed_tracers(g, 100, seed=2)
    p = np.asarray(pos)
    for ax, L in enumerate(g.lengths):
        assert np.all(p[:, ax] >= 0.05 * L) and np.all(p[:, ax] <= 0.95 * L)
    wild = jnp.asarray([[-0.5, 2.5, 9.0]], jnp.float32)
    c = np.asarray(confine(g, bcs, wild))
    assert np.all(c >= 0.0) and np.all(c <= np.asarray(g.lengths))
    # interpolation runs in 3D too
    u = tuple(jnp.ones(g.face_shape(a), jnp.float32) for a in range(3))
    v = np.asarray(velocity_at(g, bcs, u, pos))
    np.testing.assert_allclose(v, 1.0, atol=1e-6)


def test_cli_tracers_checkpoint_resume(tmp_path):
    import os

    import numpy as np

    from navierstokessolver_tpu.cli import main

    out = str(tmp_path / "run")
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "20",
        "--chunk", "10", "--out", out, "--tracers", "8",
        "--checkpoint-every", "20",
    ])
    assert rc == 0
    first = np.load(os.path.join(out, "tracers.npz"))
    assert first["traj"].shape == (20, 8, 2)
    ck = np.load(os.path.join(out, "ckpt.npz"))
    np.testing.assert_array_equal(ck["tracer_pos"], first["final"])
    # resume: tracers continue from the checkpointed positions
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "10",
        "--chunk", "10", "--out", out, "--tracers", "8",
        "--resume", os.path.join(out, "ckpt.npz"),
    ])
    assert rc == 0
    second = np.load(os.path.join(out, "tracers.npz"))
    assert second["traj"].shape == (10, 8, 2)
    # first resumed step starts from the saved positions, not a re-seed:
    # displacement from the checkpointed positions over one step is tiny
    d0 = np.abs(second["traj"][0] - first["final"]).max()
    assert d0 < 0.01
