import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from navierstokessolver_tpu.cases import make_case
import navierstokessolver_tpu.ops.pallas_kernels as pk

shape = (256, 128, 128)
cells = float(np.prod(shape))

def bench(sim, st, label, n=30, warm=5):
    out, d = sim.run_scan(st, warm)
    jax.block_until_ready(out.p)
    t0 = time.perf_counter()
    out, d = sim.run_scan(out, n)
    jax.block_until_ready(out.p)
    dtms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dtms:.2f} ms/step", flush=True)
    return dtms

case = make_case("oscillating_lid", shape=shape, re=1000.0,
                 poisson_method="fft")
sim_f = dataclasses.replace(
    case.sim, params=dataclasses.replace(case.sim.params, use_pallas=True))
st = case.initial_state()
orig = pk.refresh_dirichlet_faces_internal_3d

def make_partial(which):
    def f(grid, bcs, iu, fm=None):
        n0, n1, n2 = grid.shape
        iu0, iu1, iu2 = iu
        upd = jax.lax.dynamic_update_slice_in_dim
        def dval(a, side):
            spec = pk._own_face_spec(bcs, a, side)
            return spec[1] if spec[0] == "d" else None
        def plane(arr, axis, a, valid_axes, side):
            shp = list(arr.shape); shp[axis] = 1; shp = tuple(shp)
            vx, vy = valid_axes
            valid = ((pk._ax_iota(shp, vx[0]) < vx[1])
                     & (pk._ax_iota(shp, vy[0]) < vy[1]))
            return jnp.where(valid, jnp.asarray(dval(a, side), arr.dtype), 0.0)
        if "c0" in which:
            for side, row in ((0, 0), (1, n0)):
                if dval(0, side) is not None:
                    iu0 = upd(iu0, plane(iu0, 0, 0, ((1, n1), (2, n2)), side), row, axis=0)
        if "c1" in which:
            for side, col in ((0, 0), (1, n1)):
                if dval(1, side) is not None:
                    iu1 = upd(iu1, plane(iu1, 1, 1, ((0, n0), (2, n2)), side), col, axis=1)
        if "c2" in which:
            if dval(2, 0) is not None:
                iu2 = upd(iu2, plane(iu2, 2, 2, ((0, n0), (1, n1)), 0), 0, axis=2)
        return iu0, iu1, iu2
    return f

for which in ("none", "c0", "c1", "c2", "c0c1c2"):
    pk.refresh_dirichlet_faces_internal_3d = make_partial(which)
    bench(sim_f, st, f"refresh={which}")
pk.refresh_dirichlet_faces_internal_3d = orig
