"""Poiseuille channel: parabolic inflow at x=0, outflow at x=Lx, no-slip walls.

BASELINE.json config #2 (256x64, inflow-outflow + no-slip). Oracle: the
analytic parabolic profile ``u(y) = 4 u_max y (Ly - y) / Ly^2`` is a steady
solution of the discrete system and must persist.
"""

from __future__ import annotations

import numpy as np
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


def duct_profile_exact(ny: int, nz: int, ly: float, lz: float,
                       g_over_nu: float, n_terms: int = 61):
    """Analytic fully developed square/rectangular duct profile u(y, z) at
    cell centers: the series solution of nu lap(u) = -G with no-slip on all
    four walls (e.g. White, Viscous Fluid Flow, sec. 3-3):

        u = (G/2 nu) [ z(lz - z)
            - sum_{n odd} (8 lz^2 / (n pi)^3)
              cosh(n pi (y - ly/2)/lz) / cosh(n pi ly / (2 lz))
              sin(n pi z / lz) ]

    Returns a (ny, nz) numpy array.
    """
    import numpy as np

    y = (np.arange(ny) + 0.5) * (ly / ny)
    z = (np.arange(nz) + 0.5) * (lz / nz)
    yy, zz = np.meshgrid(y, z, indexing="ij")
    u = zz * (lz - zz)
    for n in range(1, n_terms + 1, 2):
        k = n * np.pi / lz
        u = u - (8.0 * lz * lz / (n * np.pi) ** 3) * (
            np.cosh(k * (yy - ly / 2.0)) / np.cosh(k * ly / 2.0)
        ) * np.sin(k * zz)
    return 0.5 * g_over_nu * u


def build_duct_periodic(
    shape=(64, 32, 32),
    lengths=(4.0, 1.0, 1.0),
    re: float = 100.0,
    u_scale: float = 1.0,
    dt: float | None = None,
    poisson_method: str = "fft",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    upwind_gamma: float = 0.0,
    dtype=None,
    **params_kw,
):
    """Body-force-driven rectangular duct: periodic streamwise, no-slip on
    the four transverse walls -- the 3D analog of ``channel_periodic``.

    The steady solution is the classic series profile
    (:func:`duct_profile_exact`), making this the 3D laminar validation
    oracle for the combination of periodic spectral axis + two DCT wall
    axes + body forcing. f_x is scaled so the exact profile peaks near
    ``u_scale``.
    """
    from . import Case

    grid = GridSpec(
        shape=tuple(shape), lengths=tuple(lengths), dtype=dtype or jnp.float32
    )
    ly, lz = grid.lengths[1], grid.lengths[2]
    nu = u_scale * min(ly, lz) / re
    bcs = {
        (0, 0): BCSpec.periodic(),
        (0, 1): BCSpec.periodic(),
        (1, 0): BCSpec.wall((0.0, 0.0, 0.0)),
        (1, 1): BCSpec.wall((0.0, 0.0, 0.0)),
        (2, 0): BCSpec.wall((0.0, 0.0, 0.0)),
        (2, 1): BCSpec.wall((0.0, 0.0, 0.0)),
    }
    dt = dt if dt is not None else _stable_dt(grid, nu, u_scale, upwind_gamma)
    # center velocity of a square duct is ~0.295 (G/nu) a^2 with a = lz/2;
    # pick G so the peak lands near u_scale
    fx = u_scale * nu / (0.295 * (min(ly, lz) / 2.0) ** 2)
    params = SimParams(
        dt=dt,
        nu=nu,
        upwind_gamma=upwind_gamma,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters
        ),
    )
    sim = Simulation.build(grid, bcs, params, forcing=(fx, None, None))
    return Case(
        name="duct_periodic",
        sim=sim,
        suggested_steps=4000,
        description="body-force-driven periodic duct (exact series profile)",
    )


def build_pulsatile_channel(
    shape=(64, 64),
    lengths=(2.0, 1.0),
    womersley: float = 5.0,
    amp: float = 1.0,
    omega: float = 2.0 * np.pi,
    dt: float | None = None,
    poisson_method: str = "fft",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    dtype=None,
    **params_kw,
):
    """Pulsatile (Womersley) channel: oscillating body force, no-slip walls.

    The classic unsteady exact solution: ``f_x(t) = amp cos(omega t)`` in a
    streamwise-periodic channel. The velocity profile is the Womersley
    solution -- parabolic at low Womersley number ``Wo = (Ly/2)
    sqrt(omega/nu)``, plug-like with near-wall Stokes layers at high Wo.
    Exercises the time-dependent-forcing path (State.t carried through the
    scan; tests/test_timedep.py checks the solver against the EXACT
    semi-discrete response mode by mode)."""
    from . import Case

    grid = GridSpec(
        shape=tuple(shape), lengths=tuple(lengths), dtype=dtype or jnp.float32
    )
    ly = grid.lengths[1]
    nu = omega * (0.5 * ly) ** 2 / (womersley * womersley)
    bcs = {
        (0, 0): BCSpec.periodic(),
        (0, 1): BCSpec.periodic(),
        (1, 0): BCSpec.wall((0.0, 0.0)),
        (1, 1): BCSpec.wall((0.0, 0.0)),
    }
    u_scale = amp / omega  # inviscid-core velocity amplitude
    dt = dt if dt is not None else min(
        _stable_dt(grid, nu, max(u_scale, 1e-6), 0.0),
        2.0 * np.pi / omega / 200.0,   # >= 200 steps per period
    )

    def fx(t):
        return amp * jnp.cos(omega * t)

    params = SimParams(
        dt=dt,
        nu=nu,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters,
        ),
    )
    sim = Simulation.build(grid, bcs, params, forcing=(fx, None))
    period = 2.0 * np.pi / omega
    return Case(
        name="pulsatile_channel",
        sim=sim,
        suggested_steps=int(4 * period / dt),
        description=(
            f"pulsatile channel Wo={womersley} {shape} "
            f"(omega={omega:.3g}, nu={nu:.3g})"
        ),
    )
