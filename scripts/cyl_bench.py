"""Cylinder-at-scale solver comparison (VERDICT r1 item 5: an iterative
>=1 GLUPS datapoint on an obstacle/outflow topology where fft direct is
inapplicable)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import jax
from navierstokessolver_tpu.utils import jaxcache as _jc
_jc.setup()
import numpy as np
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

ap = argparse.ArgumentParser()
ap.add_argument('--method', type=str, default='dctcg')
ap.add_argument('--shape', type=str, default='2048x1024')
ap.add_argument('--steps', type=int, default=30)
ap.add_argument('--settle', type=int, default=30)
ap.add_argument('--beta', type=float, default=None, help='warm-start extrapolation override')
ap.add_argument('--pallas', action='store_true',
                help='fused 2D whole-step kernels around the pressure solve')
args = ap.parse_args()

shape = tuple(int(x) for x in args.shape.split('x'))
kw = {} if args.beta is None else {'poisson_extrapolate': args.beta}
if args.pallas:
    kw['use_pallas'] = True
case = make_case('cylinder', shape=shape, re=200.0, poisson_method=args.method, **kw)
sim = case.sim
st = impulsive_start_state(sim)
st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
for _ in range(max(0, args.settle - args.steps) // args.steps):
    st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
t0 = time.perf_counter()
st, d = sim.run_scan(st, args.steps)
jax.block_until_ready(st.p)
el = (time.perf_counter() - t0) / args.steps
it = np.asarray(d.poisson_iters)
n = shape[0] * shape[1]
print(f"{args.method} {shape}: {el*1e3:.2f} ms/step ({n/el/1e6:.0f} MLUPS), "
      f"iters mean={it.mean():.1f} max={it.max()}, "
      f"res={float(d.poisson_res[-1]):.1e}, div={float(d.max_div[-1]):.1e}")
