import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time, dataclasses
import jax
from navierstokessolver_tpu.utils import jaxcache as _jc
_jc.setup()

import numpy as np
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.ops import multigrid
from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

ap = argparse.ArgumentParser()
ap.add_argument('pre', type=int)
ap.add_argument('post', type=int)
ap.add_argument('coarse', type=int, nargs='?', default=60)
ap.add_argument('--fused', type=int, default=None, help='0/1 override (default: auto)')
ap.add_argument('--max-levels', type=int, default=8)
ap.add_argument('--shape', type=str, default='2048x1024')
ap.add_argument('--steps', type=int, default=30)
ap.add_argument('--settle', type=int, default=0, help='extra un-timed steps before measuring')
args = ap.parse_args()

shape = tuple(int(x) for x in args.shape.split('x'))
case = make_case('cylinder', shape=shape, re=200.0, poisson_method='mg')
sim0 = case.sim
solid = np.asarray(sim0.op.fluid) == 0
fused = None if args.fused is None else bool(args.fused)
mg = multigrid.MGPoissonSolver.build(
    sim0.grid, sim0.bcs, solid, pre=args.pre, post=args.post,
    coarse_iters=args.coarse, max_levels=args.max_levels, fused=fused)
sim = dataclasses.replace(sim0, mg_solver=mg)
st = impulsive_start_state(sim)
st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
for _ in range(args.settle // args.steps):
    st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
t0 = time.perf_counter()
st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
el = (time.perf_counter()-t0)/args.steps
it = np.asarray(d.poisson_iters)
ncells = shape[0]*shape[1]
print(f"V({args.pre},{args.post}) coarse={args.coarse} fused={mg.fused} levels={len(mg.ops)}: "
      f"{el*1e3:.2f} ms/step ({ncells/el/1e6:.0f} MLUPS), iters mean={it.mean():.1f} max={it.max()}, "
      f"res={float(d.poisson_res[-1]):.1e}, div={float(d.max_div[-1]):.1e}")
