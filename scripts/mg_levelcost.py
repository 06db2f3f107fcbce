"""Per-level cost profile of one MG V-cycle at 2048x1024 cylinder.

Times a single jitted V-cycle for hierarchies truncated at max_levels =
1..8 (coarse solve always at the bottom level). The delta between depth k
and k+1 is the cost of everything below level k.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import jax, jax.numpy as jnp
from navierstokessolver_tpu.utils import jaxcache as _jc
_jc.setup()
import numpy as np
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.ops import multigrid

ap = argparse.ArgumentParser()
ap.add_argument('--shape', type=str, default='2048x1024')
ap.add_argument('--fused', type=int, default=0)
ap.add_argument('--coarse', type=int, default=60)
ap.add_argument('--depths', type=str, default='1,2,3,4,5,6,7,8')
ap.add_argument('--reps', type=int, default=50)
args = ap.parse_args()

shape = tuple(int(x) for x in args.shape.split('x'))
case = make_case('cylinder', shape=shape, re=200.0, poisson_method='mg')
sim = case.sim
solid = np.asarray(sim.op.fluid) == 0

key = jax.random.PRNGKey(0)
b = jax.random.normal(key, shape, jnp.float32)
p0 = jnp.zeros(shape, jnp.float32)

for depth in [int(x) for x in args.depths.split(',')]:
    mg = multigrid.MGPoissonSolver.build(
        sim.grid, sim.bcs, solid, coarse_iters=args.coarse,
        max_levels=depth, fused=bool(args.fused))
    f = jax.jit(lambda p, b, mg=mg: mg._v_cycle(0, p, b, want_rsq=True))
    p, r = f(p0, b)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        p, r = f(p, b)
    jax.block_until_ready(p)
    el = (time.perf_counter() - t0) / args.reps
    print(f"depth={depth} fused={mg.fused}: {el*1e3:.3f} ms/cycle", flush=True)
