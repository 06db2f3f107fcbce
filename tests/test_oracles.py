"""CI-light physics oracles (VERDICT r1 item 10): the PARITY.md claims from
scripts/ghia_validation.py and scripts/strouhal.py, continuously verified as
``@pytest.mark.slow`` tests (excluded from the default quick suite by
pytest.ini; run with ``python -m pytest tests/ -m slow -q``).

Oracles are public literature values: Ghia, Ghia & Shin (1982) cavity
centerline extrema; Williamson (1989) cylinder Strouhal number. Grids are
deliberately small, so the tolerances are discretization-limited, not
solver-limited; the full-resolution numbers live in docs/PARITY.md.
"""

import numpy as np
import pytest

from navierstokessolver_tpu import interpolate_to_centers
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.solver import steady_state_delta

pytestmark = pytest.mark.slow


def _run_to_steady(sim, state, t_end, chunk=500, tol=1e-5):
    dt = sim.params.dt
    steps = 0
    while steps * dt < t_end:
        prev = state
        state, _ = sim.run_scan(state, chunk)
        steps += chunk
        if steady_state_delta(prev, state, dt * chunk) < tol:
            break
    return state


def test_ghia_re1000_centerlines():
    """Re=1000 cavity at 128^2: centerline extrema vs Ghia et al. table.

    At 128^2 with gamma=0.25 donor-cell blending the discretization error
    dominates (measured: u_min 7.7%, v_max 8.3%, v_min 4.2%); 12% relative
    tolerance brackets it (full-resolution run in docs/PARITY.md: 256^2
    within ~2%)."""
    case = make_case("cavity", shape=(128, 128), re=1000.0, upwind_gamma=0.25)
    sim = case.sim
    state = _run_to_steady(sim, case.initial_state(), t_end=50.0)
    uc, vc = interpolate_to_centers(sim.grid, state.u)
    n = sim.grid.shape[0]
    u_min = float(np.asarray(uc)[n // 2, :].min())
    v_line = np.asarray(vc)[:, n // 2]
    assert abs(u_min - (-0.38289)) / 0.38289 < 0.12, u_min
    assert abs(float(v_line.max()) - 0.37095) / 0.37095 < 0.12, v_line.max()
    assert abs(float(v_line.min()) - (-0.51550)) / 0.51550 < 0.12, v_line.min()


def test_strouhal_smoke():
    """Small-grid (192x96) Re=200 cylinder: vortex shedding onsets and the
    Strouhal number lands in a loose literature bracket (0.15-0.25; the
    512x256 production run in docs/PARITY.md hits ~0.19-0.20)."""
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

    case = make_case(
        "cylinder", shape=(192, 96), re=200.0, poisson_method="mg"
    )
    sim = case.sim
    g = sim.grid
    dt = sim.params.dt
    chunk = 25
    t_end = 90.0
    ix = int((4.0 + 2.5) / g.lengths[0] * g.shape[0])
    iy = g.shape[1] // 2

    state = impulsive_start_state(sim)
    series = []
    done = 0
    n_steps = int(t_end / dt)
    while done + chunk <= n_steps:
        state, _ = sim.run_scan(state, chunk)
        series.append(float(state.u[1][ix, iy]))
        done += chunk

    sig = np.asarray(series[len(series) // 2:], dtype=np.float64)
    sig -= sig.mean()
    assert sig.max() - sig.min() > 0.05, "no shedding developed"
    freqs = np.fft.rfftfreq(len(sig), d=chunk * dt)
    amp = np.abs(np.fft.rfft(sig))
    st = float(freqs[np.argmax(amp[1:]) + 1])  # D = U = 1
    assert 0.15 < st < 0.25, st
