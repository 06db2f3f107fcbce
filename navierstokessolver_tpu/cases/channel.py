"""Poiseuille channel: parabolic inflow at x=0, outflow at x=Lx, no-slip walls.

BASELINE.json config #2 (256x64, inflow-outflow + no-slip). Oracle: the
analytic parabolic profile ``u(y) = 4 u_max y (Ly - y) / Ly^2`` is a steady
solution of the discrete system and must persist.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bcs import BCSpec
from ..grid import GridSpec, State
from ..ops.poisson import PoissonConfig
from ..solver import SimParams, Simulation
from .cavity import _stable_dt


def parabolic_profile(grid: GridSpec, u_max: float):
    """Inflow u(y) at cell-center heights (the u-component face slice)."""
    y = grid.cell_centers(1)
    ly = grid.lengths[1]
    return 4.0 * u_max * y * (ly - y) / (ly * ly)


def build_channel(
    shape=(256, 64),
    lengths=(4.0, 1.0),
    re: float = 100.0,
    u_max: float = 1.0,
    dt: float | None = None,
    poisson_method: str = "mg",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    upwind_gamma: float = 0.0,
    dtype=None,
    outlet: str = "outflow",
    **params_kw,
):
    from . import Case

    grid = GridSpec(shape=tuple(shape), lengths=tuple(lengths), dtype=dtype or jnp.float32)
    nu = u_max * grid.lengths[1] / re
    profile = parabolic_profile(grid, u_max)
    # outlet: "outflow" (zero-gradient) or "convective" (du/dt + U du/dn = 0
    # with U = the bulk inflow speed -- less reflective for unsteady wakes)
    out_bc = (BCSpec.convective(2.0 * u_max / 3.0)
              if outlet == "convective" else BCSpec.outflow())
    bcs = {
        (0, 0): BCSpec.inflow((profile, 0.0)),
        (0, 1): out_bc,
        (1, 0): BCSpec.wall((0.0, 0.0)),
        (1, 1): BCSpec.wall((0.0, 0.0)),
    }
    dt = dt if dt is not None else _stable_dt(grid, nu, u_max, upwind_gamma)
    params = SimParams(
        dt=dt,
        nu=nu,
        upwind_gamma=upwind_gamma,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters
        ),
    )
    sim = Simulation.build(grid, bcs, params)
    case = Case(
        name="channel",
        sim=sim,
        suggested_steps=int(8.0 / dt),
        description=f"Poiseuille channel Re={re} {shape}",
    )
    return case


def poiseuille_state(sim: Simulation, u_max: float = 1.0) -> State:
    """Exact steady state: parabolic u everywhere, v = 0, p linear (left as 0)."""
    grid = sim.grid
    profile = parabolic_profile(grid, u_max)
    st = sim.initial_state()
    u0 = jnp.broadcast_to(profile[None, :], grid.face_shape(0)).astype(grid.dtype)
    from .. import bcs as bcs_mod

    u = bcs_mod.apply_velocity_bcs(grid, sim.bcs, (u0, st.u[1]), sim.face_masks)
    return State(u=u, p=st.p)


def build_channel_periodic(
    shape=(256, 64),
    lengths=(4.0, 1.0),
    re: float = 100.0,
    u_max: float = 1.0,
    dt: float | None = None,
    poisson_method: str = "fft",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    upwind_gamma: float = 0.0,
    dtype=None,
    **params_kw,
):
    """Body-force-driven channel: periodic streamwise, no-slip walls.

    The classic turbulent-channel setup (here laminar validation): a constant
    body force f_x = 8 nu u_max / Ly^2 replaces the mean pressure gradient;
    the Poiseuille parabola is the steady solution. Exercises the mixed
    spectral solve (circulant eigenbasis along x, DCT along y).
    """
    from . import Case

    grid = GridSpec(
        shape=tuple(shape), lengths=tuple(lengths), dtype=dtype or jnp.float32
    )
    ly = grid.lengths[1]
    nu = u_max * ly / re
    bcs = {
        (0, 0): BCSpec.periodic(),
        (0, 1): BCSpec.periodic(),
        (1, 0): BCSpec.wall((0.0, 0.0)),
        (1, 1): BCSpec.wall((0.0, 0.0)),
    }
    dt = dt if dt is not None else _stable_dt(grid, nu, u_max, upwind_gamma)
    fx = 8.0 * nu * u_max / (ly * ly)
    params = SimParams(
        dt=dt,
        nu=nu,
        upwind_gamma=upwind_gamma,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters
        ),
    )
    sim = Simulation.build(grid, bcs, params, forcing=(fx, None))
    case = Case(
        name="channel_periodic",
        sim=sim,
        suggested_steps=2000,
        description="body-force-driven periodic channel (laminar Poiseuille)",
    )

    def initial_state():
        profile = parabolic_profile(grid, u_max)
        u = jnp.broadcast_to(profile[None, :], grid.face_shape(0))
        v = jnp.zeros(grid.face_shape(1), grid.dtype)
        p = jnp.zeros(grid.shape, grid.dtype)
        from .. import bcs as bcs_mod

        uu = bcs_mod.apply_velocity_bcs(grid, bcs, (u, v))
        return State(u=uu, p=p)

    case.initial_state = initial_state
    return case
