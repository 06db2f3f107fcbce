import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, dataclasses
import jax
jax.config.update('jax_compilation_cache_dir','/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs',1.0)
import numpy as np
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.ops import multigrid
from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

pre, post = int(sys.argv[1]), int(sys.argv[2])
coarse = int(sys.argv[3]) if len(sys.argv) > 3 else 60
case = make_case('cylinder', shape=(2048,1024), re=200.0, poisson_method='mg')
sim0 = case.sim
solid = np.asarray(sim0.op.fluid) == 0
steps = 30
if (pre, post) != (2, 2) or coarse != 60:
    mg = multigrid.MGPoissonSolver.build(sim0.grid, sim0.bcs, solid, pre=pre, post=post, coarse_iters=coarse)
    sim = dataclasses.replace(sim0, mg_solver=mg)
else:
    sim = sim0
st = impulsive_start_state(sim)
st, d = sim.run_scan(st, steps)
jax.block_until_ready(st.p)
t0 = time.perf_counter()
st, d = sim.run_scan(st, steps)
jax.block_until_ready(st.p)
el = (time.perf_counter()-t0)/steps
it = np.asarray(d.poisson_iters)
print(f"V({pre},{post}) coarse={coarse}: {el*1e3:.2f} ms/step ({2048*1024/el/1e6:.0f} MLUPS), iters mean={it.mean():.1f} max={it.max()}, res={float(d.poisson_res[-1]):.1e}, div={float(d.max_div[-1]):.1e}")
