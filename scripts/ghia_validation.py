#!/usr/bin/env python
"""Lid-driven cavity validation against Ghia, Ghia & Shin (1982).

Runs the cavity to steady state and compares the centerline velocity
extrema against the published benchmark values:

  Re=100 : u_min = -0.21090 (y=0.4531 grid 129), v_max = 0.17527
  Re=1000: u_min = -0.38289 (y=0.1719),  v_max = 0.37095, v_min = -0.51550

Usage: python scripts/ghia_validation.py --re 1000 --n 256 --t-end 40
Writes one JSON line with the measured extrema and relative errors.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GHIA = {
    100.0: {"u_min": -0.21090, "v_max": 0.17527, "v_min": -0.24533},
    1000.0: {"u_min": -0.38289, "v_max": 0.37095, "v_min": -0.51550},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--t-end", type=float, default=40.0)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--gamma", type=float, default=-1.0,
                    help="upwind blend; <0 = auto (0.5 above Re 500)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from navierstokessolver_tpu.utils import jaxcache as _jc
    _jc.setup()

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu import interpolate_to_centers
    from navierstokessolver_tpu.solver import steady_state_delta

    gamma = args.gamma if args.gamma >= 0 else (0.5 if args.re > 500 else 0.0)
    case = make_case("cavity", shape=(args.n, args.n), re=args.re,
                     upwind_gamma=gamma)
    sim = case.sim
    dt = sim.params.dt
    state = case.initial_state()
    t0 = time.perf_counter()
    steps = 0
    while steps * dt < args.t_end:
        prev = state
        state, diag = sim.run_scan(state, args.chunk)
        steps += args.chunk
        d = steady_state_delta(prev, state, dt * args.chunk)
        print(f"[ghia] t={steps*dt:.1f} d(u)/dt={d:.2e} "
              f"max_div={float(diag.max_div[-1]):.1e}", file=sys.stderr)
        if d < 1e-5:
            break
    uc, vc = interpolate_to_centers(sim.grid, state.u)
    n = args.n
    u_line = np.asarray(uc)[n // 2, :]   # x = 0.5 centerline
    v_line = np.asarray(vc)[:, n // 2]   # y = 0.5 centerline
    res = {
        "re": args.re, "n": n, "gamma": gamma, "t": steps * dt,
        "u_min": float(u_line.min()),
        "v_max": float(v_line.max()),
        "v_min": float(v_line.min()),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    ref = GHIA.get(args.re)
    if ref:
        for k, rv in ref.items():
            res[f"err_{k}"] = round(abs(res[k] - rv) / abs(rv), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
