"""Integration: lid-driven cavity Re=100 vs Ghia, Ghia & Shin (1982).

SURVEY.md SS4 Integration tier; BASELINE.json config #1 (64x64 staggered
grid). The Ghia tables are public literature values (J. Comput. Phys. 48,
387-411, Table I/II, Re=100 column), independent of the unreadable reference.
"""

import numpy as np
import pytest

from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.solver import steady_state_delta

# (y, u) on the vertical centerline x = 0.5, Re = 100 (Ghia Table I).
GHIA_U = np.array([
    [1.0000, 1.00000],
    [0.9766, 0.84123],
    [0.9688, 0.78871],
    [0.9609, 0.73722],
    [0.9531, 0.68717],
    [0.8516, 0.23151],
    [0.7344, 0.00332],
    [0.6172, -0.13641],
    [0.5000, -0.20581],
    [0.4531, -0.21090],
    [0.2813, -0.15662],
    [0.1719, -0.10150],
    [0.1016, -0.06434],
    [0.0703, -0.04775],
    [0.0625, -0.04192],
    [0.0547, -0.03717],
    [0.0000, 0.00000],
])

# (x, v) on the horizontal centerline y = 0.5, Re = 100 (Ghia Table II).
GHIA_V = np.array([
    [1.0000, 0.00000],
    [0.9688, -0.05906],
    [0.9609, -0.07391],
    [0.9531, -0.08864],
    [0.9453, -0.10313],
    [0.9063, -0.16914],
    [0.8594, -0.22445],
    [0.8047, -0.24533],
    [0.5000, 0.05454],
    [0.2344, 0.17527],
    [0.2266, 0.17507],
    [0.1563, 0.16077],
    [0.0938, 0.12317],
    [0.0781, 0.10890],
    [0.0703, 0.10091],
    [0.0625, 0.09233],
    [0.0000, 0.00000],
])


@pytest.fixture(scope="module")
def steady_cavity():
    case = make_case("cavity", shape=(64, 64), dt=0.005)
    sim = case.sim
    st = case.initial_state()
    prev = st
    for _ in range(16):  # up to t = 40, with early exit at steadiness
        st, diag = sim.run_scan(st, 500)
        if steady_state_delta(prev, st, sim.params.dt * 500) < 2e-4:
            break
        prev = st
    return case, st, diag


def test_ghia_u_centerline(steady_cavity):
    case, st, _ = steady_cavity
    g = case.sim.grid
    nx = g.shape[0]
    u_col = np.asarray(st.u[0])[nx // 2, :]  # x-face exactly at x=0.5
    y = np.asarray(g.cell_centers(1))
    y_ext = np.concatenate([[0.0], y, [1.0]])
    u_ext = np.concatenate([[0.0], u_col, [1.0]])  # walls/lid
    u_interp = np.interp(GHIA_U[:, 0], y_ext, u_ext)
    err = np.abs(u_interp - GHIA_U[:, 1])
    assert err.max() < 0.035, f"max |u - Ghia| = {err.max():.4f}"


def test_ghia_v_centerline(steady_cavity):
    case, st, _ = steady_cavity
    g = case.sim.grid
    ny = g.shape[1]
    v_row = np.asarray(st.u[1])[:, ny // 2]  # y-face exactly at y=0.5
    x = np.asarray(g.cell_centers(0))
    x_ext = np.concatenate([[0.0], x, [1.0]])
    v_ext = np.concatenate([[0.0], v_row, [0.0]])
    v_interp = np.interp(GHIA_V[:, 0], x_ext, v_ext)
    err = np.abs(v_interp - GHIA_V[:, 1])
    assert err.max() < 0.035, f"max |v - Ghia| = {err.max():.4f}"


def test_projection_enforces_divergence_free(steady_cavity):
    _, _, diag = steady_cavity
    assert float(diag.max_div[-1]) < 5e-4


def test_poisson_warm_start_pays_off(steady_cavity):
    """Near steady state the warm-started pressure solve needs few iterations."""
    _, _, diag = steady_cavity
    assert int(diag.poisson_iters[-1]) < 50
