#!/usr/bin/env python
"""3D sphere wake forces at Re=300 (docs/PARITY.md round-5 datapoints).

Oracle (public literature): Johnson & Patel 1999 / Tomboulides: mean
Cd ~ 0.656-0.66, one-sided planar-symmetric lift |Cl| ~ 0.069,
St ~ 0.137. Measured here: Cd 0.829/0.765/0.736 at 16/24/32 cells/D
(SPH_SHAPE=256,128,128 / 384,192,192 / 512,256,256 with SPH_IBM=1);
first-order Richardson extrapolation ~ 0.64-0.65.

Env knobs: SPH_SHAPE (grid), SPH_IBM=1 (sharp-interface IBM),
SPH_MARGIN (CV box margin in diameters, default 1.5).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from navierstokessolver_tpu.utils import jaxcache
jaxcache.setup()
import jax.numpy as jnp
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.cases.cylinder import impulsive_start_state
from navierstokessolver_tpu.utils.forces import dominant_frequency

import os
shape = tuple(int(x) for x in os.environ.get("SPH_SHAPE", "256,128,128").split(","))
case = make_case("sphere", shape=shape, re=300.0, ibm=os.environ.get("SPH_IBM", "") == "1")
sim = case.sim
g = sim.grid
dt = sim.params.dt
h = g.spacing
c = (4.0, 4.003, 3.997)
box = []
import os as _os
margin = float(_os.environ.get("SPH_MARGIN", "1.5"))
for a in range(3):
    box += [int((c[a] - margin) / h[a]), int((c[a] + margin) / h[a])]
box = box[:6]
box = tuple(box)
print("dt:", dt, "box:", box, file=sys.stderr)
st = impulsive_start_state(sim)
n_steps = int(150.0 / dt)
chunk = 250
sfs, moms = [], []
t0 = time.time()
done = 0
while done + chunk <= n_steps:
    st, d, sf, mom = sim.run_scan_forces(st, chunk, box)
    sfs.append(np.asarray(sf)); moms.append(np.asarray(mom))
    done += chunk
    if done % 5000 == 0:
        print(f"t={done*dt:.1f} wall={time.time()-t0:.0f}s", file=sys.stderr)
sf = np.concatenate(sfs); mom = np.concatenate(moms)
# 3D sphere normalization: Cd = F / (0.5 rho U^2 * pi D^2/4)
A = np.pi * 0.25
fx = -np.gradient(mom[:, 0], dt) + sf[:, 0]
fy = -np.gradient(mom[:, 1], dt) + sf[:, 1]
fz = -np.gradient(mom[:, 2], dt) + sf[:, 2]
cd = fx / (0.5 * A); cly = fy / (0.5 * A); clz = fz / (0.5 * A)
half = len(cd) // 2
st_y = dominant_frequency(cly[half:], dt)
st_z = dominant_frequency(clz[half:], dt)
import json
print(json.dumps({
    "cd_mean": round(float(cd[half:].mean()), 4),
    "cl_lateral_mean": round(float(np.hypot(cly[half:].mean(), clz[half:].mean())), 4),
    "st_y": round(st_y, 4), "st_z": round(st_z, 4),
    "cd_osc_amp": round(float((cd[half:].max() - cd[half:].min()) / 2), 4),
    "t_end": done * dt, "wall_s": round(time.time() - t0, 1),
}))
