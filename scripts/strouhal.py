#!/usr/bin/env python
"""Cylinder vortex-shedding validation: measures the Strouhal number.

BASELINE.md oracle: St = f D / U ~ 0.19-0.20 at Re=200 (public literature,
e.g. Williamson 1989). Runs the BASELINE #3 config (512x256, Re=200),
records the cross-stream velocity at a wake probe, and extracts the
dominant frequency from the last half of the series.

Usage: python scripts/strouhal.py [--shape 512,256] [--t-end 150]
Writes one JSON line to stdout: {"strouhal": ..., "re": 200, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="512,256")
    ap.add_argument("--re", type=float, default=200.0)
    ap.add_argument("--t-end", type=float, default=150.0)
    ap.add_argument("--poisson", default="mg")
    ap.add_argument("--outlet", default="outflow",
                    choices=["outflow", "convective"])
    ap.add_argument("--chunk", type=int, default=25)  # ~0.2 time units/sample: ~23 samples per shedding period
    args = ap.parse_args()
    shape = tuple(int(x) for x in args.shape.split(","))

    import jax

    from navierstokessolver_tpu.utils import jaxcache as _jc
    _jc.setup()

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

    case = make_case(
        "cylinder", shape=shape, re=args.re, poisson_method=args.poisson,
        outlet=args.outlet,
    )
    sim = case.sim
    g = sim.grid
    dt = sim.params.dt
    n_steps = int(args.t_end / dt)
    # probe: 2.5 diameters downstream of the cylinder center, on the centerline
    ix = int((4.0 + 2.5) / g.lengths[0] * g.shape[0])
    iy = g.shape[1] // 2

    state = impulsive_start_state(sim)
    series = []
    t0 = time.time()
    done = 0
    while done < n_steps:
        k = min(args.chunk, n_steps - done)
        if k != args.chunk:
            break  # keep one compiled chunk length; drop the remainder
        state, diag = sim.run_scan(state, k)
        v = float(state.u[1][ix, iy])
        series.append(v)
        done += k
        if done % (args.chunk * 200) == 0:
            print(
                f"[strouhal] t={done*dt:.1f}/{args.t_end} v_probe={v:+.4f} "
                f"({time.time()-t0:.0f}s)",
                file=sys.stderr,
            )

    # dominant frequency from the second half (shedding fully developed)
    sig = np.asarray(series[len(series) // 2:], dtype=np.float64)
    sig = sig - sig.mean()
    dt_sample = args.chunk * dt
    freqs = np.fft.rfftfreq(len(sig), d=dt_sample)
    amp = np.abs(np.fft.rfft(sig))
    f_shed = float(freqs[np.argmax(amp[1:]) + 1])
    st = f_shed * 1.0 / 1.0  # D = U = 1
    print(json.dumps({
        "strouhal": round(st, 4),
        "re": args.re,
        "shape": list(shape),
        "poisson": args.poisson,
        "t_end": done * dt,
        "samples": len(series),
        "peak_to_peak_v": float(sig.max() - sig.min()),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
