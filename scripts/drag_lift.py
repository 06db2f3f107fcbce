#!/usr/bin/env python
"""Cylinder drag/lift coefficients via control-volume momentum balance.

Oracle (public literature, Re=200): mean Cd ~ 1.3-1.4, Cl amplitude ~ 0.7,
shedding at St ~ 0.2 (e.g. Braza et al. 1986).

Usage: python scripts/drag_lift.py [--shape 512,256] [--t-end 150]
Writes one JSON line: {"cd_mean": ..., "cl_amp": ..., ...}
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
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--ibm", action="store_true",
                    help="sharp-interface immersed boundary (ibm.py)")
    ap.add_argument("--sharp-pressure", action="store_true",
                    help="cut-cell apertured Poisson (cutcell.py; "
                         "requires --ibm and an iterative/mg --poisson)")
    ap.add_argument("--spin", type=float, default=0.0,
                    help="rotation rate alpha = omega R / U (requires "
                         "--ibm); Magnus oracle: mean Cl ~ -2.5 at "
                         "Re=200, alpha=1 (Mittal & Kumar 2003)")
    # error-budget knobs (VERDICT r3 item 9): sweep ONE at a time
    ap.add_argument("--gamma", type=float, default=None,
                    help="override upwind_gamma (case default 0.2)")
    ap.add_argument("--integrator", default=None,
                    help="euler | rk2 (case default euler)")
    ap.add_argument("--dt-scale", type=float, default=1.0,
                    help="multiply the case's stable dt (e.g. 0.5)")
    ap.add_argument("--lengths", default="",
                    help="domain lengths, e.g. 24,8 (default 16,8); pair "
                         "with --shape to keep h fixed")
    ap.add_argument("--center", default="",
                    help="cylinder center, e.g. 4.0,4.01")
    args = ap.parse_args()
    shape = tuple(int(x) for x in args.shape.split(","))

    import jax

    from navierstokessolver_tpu.utils import jaxcache as _jc
    _jc.setup()

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state
    from navierstokessolver_tpu.utils.forces import (
        dominant_frequency,
        drag_lift_series,
    )

    kw = dict(shape=shape, re=args.re, poisson_method=args.poisson,
              ibm=args.ibm, spin=args.spin,
              sharp_pressure=args.sharp_pressure)
    if args.gamma is not None:
        kw["upwind_gamma"] = args.gamma
    if args.integrator:
        kw["integrator"] = args.integrator
    if args.lengths:
        kw["lengths"] = tuple(float(x) for x in args.lengths.split(","))
    if args.center:
        kw["center"] = tuple(float(x) for x in args.center.split(","))
    case = make_case("cylinder", **kw)
    sim = case.sim
    if args.dt_scale != 1.0:
        import dataclasses as _dc

        sim = _dc.replace(sim, params=_dc.replace(
            sim.params, dt=sim.params.dt * args.dt_scale))
    g = sim.grid
    dt = sim.params.dt
    # CV box: 1 diameter of margin around the cylinder (default center
    # (4, ~4), D=1; follows --center when overridden)
    cx, cy = (float(x) for x in args.center.split(",")) if args.center \
        else (4.0, g.lengths[1] / 2.0)
    hx, hy = g.spacing
    i0, i1 = int((cx - 1.5) / hx), int((cx + 1.5) / hx)
    j0, j1 = int((cy - 1.5) / hy), int((cy + 1.5) / hy)
    box = (i0, i1, j0, j1)

    state = impulsive_start_state(sim)
    n_steps = int(args.t_end / dt)
    sfs, moms = [], []
    t0 = time.time()
    done = 0
    # per-STEP force series via the in-scan sampler (chunked only so the
    # window logs/compile stay bounded; the series itself has no gaps)
    while done + args.chunk <= n_steps:
        state, diag, sf, mom = sim.run_scan_forces(state, args.chunk, box)
        sfs.append(np.asarray(sf)); moms.append(np.asarray(mom))
        done += args.chunk
    sf = np.concatenate(sfs)
    mom = np.concatenate(moms)

    cd, cl = drag_lift_series(
        g, sim.params.nu, box, sf[:, 0], sf[:, 1], mom[:, 0], mom[:, 1], dt
    )
    half = len(cd) // 2
    out = {
        "cd_mean": round(float(np.mean(cd[half:])), 4),
        "cl_amp": round(float((cl[half:].max() - cl[half:].min()) / 2), 4),
        # shedding frequency straight off the per-step lift series (D=U=1)
        "st_from_cl": round(dominant_frequency(cl[half:], dt), 4),
        "cl_mean": round(float(np.mean(cl[half:])), 4),
        "re": args.re, "shape": list(shape), "ibm": args.ibm,
        "sharp_pressure": args.sharp_pressure,
        "spin": args.spin,
        "t_end": done * dt,
        "gamma": args.gamma, "integrator": args.integrator,
        "dt_scale": args.dt_scale, "lengths": args.lengths or "16,8",
        "poisson": args.poisson,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
