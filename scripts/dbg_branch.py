import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax.numpy as jnp
import navierstokessolver_tpu.bcs as bcs_mod
from navierstokessolver_tpu.cases import make_case

case = make_case("oscillating_lid", shape=(256, 128, 128), re=1000.0,
                 poisson_method="fft")
sim_f = dataclasses.replace(
    case.sim, params=dataclasses.replace(case.sim.params, use_pallas=True))
c = sim_f._consts()
print("fc3d in consts:", "fc3d" in c)
bound = sim_f._bind(c)
st = case.initial_state()
print("t is not None:", st.t is not None,
      "bcs_td:", bcs_mod.bcs_time_dependent(bound.bcs),
      "diff:", bound.diff_solve, "ndim:", bound.grid.ndim,
      "shardings:", bound.shardings)
b0, f0 = bound._resolve_timedep(jnp.zeros((), bound.grid.dtype))
probe = bound._timedep_resolved(b0, f0)
print("probe._fused3d_ok():", probe._fused3d_ok())
