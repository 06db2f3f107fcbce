import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from navierstokessolver_tpu.cases import make_case

shape = (256, 128, 128)
cells = float(np.prod(shape))

def bench(sim, st, label, n=50, warm=10):
    out, d = sim.run_scan(st, warm)
    _ = float(jnp.sum(out.p))     # host round-trip: true sync through the tunnel
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out, d = sim.run_scan(out, n)
        _ = float(jnp.sum(out.p))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{label}: {best:.2f} ms/step  {cells/(best*1e-3)/1e6:.0f} MLUPS",
          flush=True)
    return best

case = make_case("oscillating_lid", shape=shape, re=1000.0,
                 poisson_method="fft")
st = case.initial_state()
sim_f = dataclasses.replace(
    case.sim, params=dataclasses.replace(case.sim.params, use_pallas=True))
sim_j = dataclasses.replace(
    case.sim, params=dataclasses.replace(case.sim.params, use_pallas=False))
bench(sim_f, st, "warmup (discard)   ", n=20, warm=5)
tf = bench(sim_f, st, "timedep fused   fft")
tj = bench(sim_j, st, "timedep jnp     fft")
case_s = make_case("cavity3d", shape=shape, re=1000.0, poisson_method="fft")
sim_sf = dataclasses.replace(
    case_s.sim, params=dataclasses.replace(case_s.sim.params, use_pallas=True))
sim_sj = dataclasses.replace(
    case_s.sim, params=dataclasses.replace(case_s.sim.params, use_pallas=False))
tsf = bench(sim_sf, case_s.initial_state(), "static  fused   fft")
tsj = bench(sim_sj, case_s.initial_state(), "static  jnp     fft")
print(f"timedep fused speedup vs jnp: {tj/tf:.2f}x | static: {tsj/tsf:.2f}x | "
      f"timedep-over-static overhead: {tf/tsf:.3f}x")
