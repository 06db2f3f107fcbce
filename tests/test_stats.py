"""Running-statistics accumulator (stats.py + Simulation.run_scan_stats).

Oracle: two-pass numpy moments over the per-step states of the SAME
trajectory (run_scan in 1-step segments is bitwise the full scan, so the
recorded states are exactly what the in-scan accumulator saw).
"""

import numpy as np
import jax

from navierstokessolver_tpu import interpolate_to_centers
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.stats import finalize, init_stats, pair_indices


def _two_pass(grid, states):
    """Population moments of the recorded trajectory at cell centers."""
    ucs = [
        [np.asarray(c) for c in interpolate_to_centers(grid, st.u)]
        for st in states
    ]
    ps = [np.asarray(st.p) for st in states]
    nd = grid.ndim
    out = {"n": float(len(states))}
    for a in range(nd):
        xs = np.stack([u[a] for u in ucs])
        out[f"u_mean_{a}"] = xs.mean(0)
        out[f"uu_{a}{a}"] = xs.var(0)
    for i, j in pair_indices(nd):
        xi = np.stack([u[i] for u in ucs])
        xj = np.stack([u[j] for u in ucs])
        out[f"uu_{i}{j}"] = (xi * xj).mean(0) - xi.mean(0) * xj.mean(0)
    out["p_mean"] = np.stack(ps).mean(0)
    out["p_var"] = np.stack(ps).var(0)
    return out


def test_scan_stats_match_two_pass_numpy():
    case = make_case("cavity", shape=(16, 16))
    sim = case.sim
    n = 12

    st = case.initial_state()
    states = []
    for _ in range(n):
        st, _d = sim.run_scan(st, 1)
        states.append(st)
    want = _two_pass(sim.grid, states)

    st2, _d, stats = sim.run_scan_stats(case.initial_state(), n)
    got = finalize(stats)

    np.testing.assert_allclose(np.asarray(st2.p), np.asarray(st.p), atol=1e-6)
    assert int(got["n"]) == n
    for k, v in want.items():
        np.testing.assert_allclose(
            got[k], v, atol=1e-5, err_msg=f"moment {k}"
        )


def test_scan_stats_chunked_continuation():
    """stats(6) then stats(6) == stats(12): the accumulator is a carry the
    CLI threads across windows."""
    case = make_case("cavity", shape=(16, 16))
    sim = case.sim
    s0 = case.initial_state()
    _, _, full = sim.run_scan_stats(s0, 12)
    st, _, acc = sim.run_scan_stats(s0, 6)
    _, _, acc = sim.run_scan_stats(st, 6, acc)
    fa, fb = finalize(full), finalize(acc)
    for k in fa:
        np.testing.assert_allclose(fb[k], fa[k], atol=1e-6, err_msg=k)


def test_scan_stats_scalar_fields():
    """theta moments accumulate when the case transports a scalar."""
    case = make_case("heated_cavity", shape=(16, 16))
    sim = case.sim
    _, _, stats = sim.run_scan_stats(case.initial_state(), 8)
    out = finalize(stats)
    assert "theta_mean" in out and "theta_var" in out
    assert np.isfinite(out["theta_mean"]).all()
    assert (out["theta_var"] >= -1e-7).all()


def test_cli_stats_npz(tmp_path):
    from navierstokessolver_tpu.cli import main

    out = tmp_path / "o"
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "10",
        "--chunk", "4", "--stats-start", "5", "--out", str(out),
    ])
    assert rc == 0
    z = np.load(out / "stats.npz")
    assert int(z["n"]) == 5  # steps 6..10 accumulated
    assert np.isfinite(z["u_mean_0"]).all()
    assert (z["uu_00"] >= -1e-7).all()


def test_scan_stats_sharded_matches_single_device():
    """Statistics accumulate correctly under GSPMD domain decomposition
    (the accumulator fields are cell-centered, so they inherit the grid
    sharding; moments match the single-device run)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from navierstokessolver_tpu.parallel import (
        make_mesh, shard_state, sharded_simulation,
    )

    case = make_case("cavity", shape=(32, 32))
    sim = case.sim
    _, _, ref = sim.run_scan_stats(case.initial_state(), 20)

    mesh = make_mesh(8)
    sim_sh = sharded_simulation(sim, mesh)
    st_sh = shard_state(case.initial_state(), mesh, sim.grid)
    _, _, got = sim_sh.run_scan_stats(st_sh, 20)

    fa, fb = finalize(ref), finalize(got)
    for k in fa:
        np.testing.assert_allclose(fb[k], fa[k], atol=5e-5, err_msg=k)


def test_stats_checkpoint_resume_equals_unbroken(tmp_path):
    """A checkpoint taken mid-averaging carries the accumulator: resuming
    reproduces the unbroken run's statistics exactly."""
    from navierstokessolver_tpu.cli import main

    full = tmp_path / "full"
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "12",
               "--chunk", "6", "--stats-start", "2", "--out", str(full)])
    assert rc == 0

    broken = tmp_path / "broken"
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "6",
               "--chunk", "6", "--stats-start", "2",
               "--checkpoint-every", "6", "--out", str(broken)])
    assert rc == 0
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "6",
               "--chunk", "6", "--stats-start", "2",
               "--resume", str(broken / "ckpt.npz"), "--out", str(broken)])
    assert rc == 0

    a = np.load(full / "stats.npz")
    b = np.load(broken / "stats.npz")
    assert int(a["n"]) == int(b["n"]) == 10
    for k in a.files:
        np.testing.assert_allclose(b[k], a[k], atol=1e-7, err_msg=k)


def test_stats_survive_resume_without_flag(tmp_path):
    """Resuming WITHOUT re-passing --stats-start keeps the checkpointed
    accumulator and continues it (regression: stats silently reset to None
    and the next checkpoint write destroyed them)."""
    from navierstokessolver_tpu.cli import main

    full = tmp_path / "full"
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "12",
               "--chunk", "6", "--stats-start", "2", "--out", str(full)])
    assert rc == 0

    broken = tmp_path / "broken"
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "6",
               "--chunk", "6", "--stats-start", "2",
               "--checkpoint-every", "6", "--out", str(broken)])
    assert rc == 0
    rc = main(["--case", "cavity", "--shape", "16,16", "--steps", "6",
               "--chunk", "6",  # no --stats-start on the resume leg
               "--resume", str(broken / "ckpt.npz"),
               "--checkpoint-every", "6", "--out", str(broken)])
    assert rc == 0

    a = np.load(full / "stats.npz")
    b = np.load(broken / "stats.npz")
    assert int(a["n"]) == int(b["n"]) == 10
    for k in a.files:
        np.testing.assert_allclose(b[k], a[k], atol=1e-7, err_msg=k)
    # and the final checkpoint still carries the accumulator
    z = np.load(broken / "ckpt.npz")
    assert any(k.startswith("stats_") for k in z.files)


def test_forces_box_at_domain_boundary():
    """A control-volume box with its low face at index 0 must read
    one-sided values, not wrap to the far side of the domain (regression)."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.utils.forces import cv_terms_nd

    case = make_case("channel", shape=(32, 16))
    sim = case.sim
    state, _ = sim.run_scan(case.initial_state(), 5)
    sf, mom = cv_terms_nd(sim.grid, state, sim.params.nu, (0, 8, 0, 16))
    assert all(bool(jnp.isfinite(s)) for s in sf)
    # Poiseuille-like channel flow: net x-momentum in the box is positive
    # and the whole-domain-height box sees the inflow, so the face terms
    # stay at flow scale (wrapping pulled in outflow-column pressure).
    assert float(mom[0]) > 0.0
