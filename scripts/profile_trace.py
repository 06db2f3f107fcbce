#!/usr/bin/env python
"""Capture a jax.profiler trace of the step loop for TensorBoard/Perfetto.

Every phase of the projection step is wrapped in jax.named_scope
(bcs / predictor / poisson / correction / diagnostics in solver.py), so the
trace shows the per-phase breakdown on the device timeline.

Usage:
    python scripts/profile_trace.py --case cavity --nx 2048 --ny 2048 \
        --steps 20 --out /tmp/nstpu_trace
Then: tensorboard --logdir /tmp/nstpu_trace  (or open in Perfetto).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cavity")
    ap.add_argument("--nx", type=int, default=2048)
    ap.add_argument("--ny", type=int, default=2048)
    ap.add_argument("--nz", type=int, default=0, help=">0 switches to 3D")
    ap.add_argument("--re", type=float, default=10_000.0)
    ap.add_argument("--poisson", default="fft")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/nstpu_trace")
    args = ap.parse_args()

    import jax

    from navierstokessolver_tpu.utils import jaxcache as _jc
    _jc.setup()

    from navierstokessolver_tpu.cases import make_case

    shape = (args.nx, args.ny, args.nz) if args.nz else (args.nx, args.ny)
    name = "cavity3d" if (args.case == "cavity" and args.nz) else args.case
    case = make_case(
        name, shape=shape, re=args.re, poisson_method=args.poisson,
    )
    sim = case.sim
    state = case.initial_state()
    # compile + warm outside the trace window
    state, _ = sim.run_scan(state, args.steps)
    jax.block_until_ready(state.p)

    with jax.profiler.trace(args.out):
        state, diag = sim.run_scan(state, args.steps)
        jax.block_until_ready(state.p)
    print(f"[profile] {args.steps} steps traced to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
