import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax, jax.numpy as jnp
import numpy as np
from navierstokessolver_tpu.utils import jaxcache
jaxcache.setup()
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.ops import pallas_kernels as pk

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = int(sys.argv[2]) if len(sys.argv) > 2 else 512
DB = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
case = make_case("cavity3d", shape=(N, N, N), re=1000.0)
sim = case.sim
g, b, pr = sim.grid, sim.bcs, sim.params
print(f"[probe] tile={TILE} db={DB} grid={g.shape}", file=sys.stderr)

st = case.initial_state()
iu = pk.to_internal_3d(g, st.u, tile=TILE)
p = st.p


@partial(jax.jit, static_argnums=(0, 4))
def chunk(sims, consts, iu, p, steps):
    simb = sims._bind(consts)

    def body(carry, _):
        iu, p = carry
        us, rhs = pk.predictor_rhs_3d_internal(
            g, b, iu, jnp.asarray(pr.dt, g.dtype), pr.nu, 0.0,
            rho=pr.rho, tile=TILE, db=DB)
        p2, it, res = simb._solve_pressure(rhs, p)
        iun, mdiv, mvel = pk.correct_diag_3d_internal(
            g, b, us, p2, jnp.asarray(pr.dt, g.dtype) / pr.rho,
            tile=TILE, db=DB)
        return (iun, p2), (mdiv, it)
    (iu, p), (md, it) = jax.lax.scan(body, (iu, p), xs=None, length=steps)
    return iu, p, md, it


consts = sim._consts()
t0 = time.perf_counter()
iu2, p2, md, it = chunk(sim, consts, iu, p, 5)
jax.block_until_ready(p2)
print(f"[probe] compile+5 steps: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr)
t0 = time.perf_counter()
iu2, p2, md, it = chunk(sim, consts, iu2, p2, 5)
jax.block_until_ready(p2)
el = time.perf_counter() - t0
mlups = (N ** 3) * 5 / el / 1e6
print(f"[probe] 5 steps {el:.3f}s -> {el/5*1e3:.2f} ms/step, "
      f"{mlups:.0f} MLUPS, max_div={float(md[-1]):.2e}")
