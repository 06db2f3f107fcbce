import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from navierstokessolver_tpu.cases import make_case
import navierstokessolver_tpu.ops.pallas_kernels as pk

shape = (256, 128, 128)
cells = float(np.prod(shape))

def bench(sim, st, label, n=50, warm=10):
    out, d = sim.run_scan(st, warm)
    jax.block_until_ready(out.p)
    t0 = time.perf_counter()
    out, d = sim.run_scan(out, n)
    jax.block_until_ready(out.p)
    dtms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dtms:.2f} ms/step  {cells/(dtms*1e-3)/1e6:.0f} MLUPS",
          flush=True)
    return dtms

case = make_case("oscillating_lid", shape=shape, re=1000.0,
                 poisson_method="fft")
sim_f = dataclasses.replace(
    case.sim, params=dataclasses.replace(case.sim.params, use_pallas=True))
st = case.initial_state()
t_full = bench(sim_f, st, "timedep fused (hoist+refresh)")

orig = pk.refresh_dirichlet_faces_internal_3d
pk.refresh_dirichlet_faces_internal_3d = lambda g, b, iu, fm=None: iu
t_norefresh = bench(sim_f, st, "timedep fused (no refresh)  ")
pk.refresh_dirichlet_faces_internal_3d = orig

orig_h = pk._hoist_tables
def fake_hoist(tg, own, parts):
    # bake the CURRENT traced values' concrete stand-in 1.0 (wrong math,
    # perf probe only): strip tracers so the kernel bakes constants
    def hv(v):
        return v if isinstance(v, (int, float)) else 1.0
    tg2 = {k: (a, hv(b)) for k, (a, b) in tg.items()}
    own2 = {k: (("d", hv(s[1])) if s[0] == "d" else s) for k, s in own.items()}
    return tg2, own2
pk._hoist_tables = fake_hoist
t_baked = bench(sim_f, st, "timedep fused (baked consts)")
pk._hoist_tables = orig_h
print(f"refresh cost: {t_full - t_norefresh:.1f} ms, hoist cost: {t_norefresh - t_baked:.1f} ms")
