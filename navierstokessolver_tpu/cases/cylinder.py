"""Flow past a circular cylinder at Re=200 (vortex shedding).

BASELINE.json config #3 (512x256, obstacle mask). Domain 16x8 diameters,
cylinder D=1 centered at (4, 4) with a tiny vertical offset to break symmetry
and trigger shedding deterministically. Oracle: Strouhal ~ 0.19-0.20.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bcs import BCSpec
from ..grid import GridSpec, State
from ..ops.poisson import PoissonConfig
from ..solver import SimParams, Simulation
from .cavity import _stable_dt


def cylinder_mask(grid: GridSpec, center, radius: float) -> np.ndarray:
    """Solid-cell mask: cell centers inside the circle."""
    coords = np.meshgrid(
        *[np.asarray(grid.cell_centers(a)) for a in range(grid.ndim)],
        indexing="ij",
    )
    r2 = sum((c - c0) ** 2 for c, c0 in zip(coords, center))
    return r2 <= radius * radius


def build_cylinder(
    shape=(512, 256),
    lengths=(16.0, 8.0),
    re: float = 200.0,
    u_in: float = 1.0,
    diameter: float = 1.0,
    center=(4.0, 4.003),  # slight y-offset seeds the shedding instability
    dt: float | None = None,
    # dctcg (capacitance-corrected spectral preconditioner) measured 2.1x
    # multigrid on this topology at 512x256 (0.15 vs 0.32 ms/step) and
    # 2.6x at 2048x1024 -- docs/PARITY.md; mg/cg/sor remain available.
    poisson_method: str = "dctcg",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    upwind_gamma: float = 0.2,
    dtype=None,
    outlet: str = "outflow",
    poisson_extrapolate: float = 0.8,
    ibm: bool = False,
    spin: float = 0.0,
    sharp_pressure: bool = False,
    heated: bool = False,
    prandtl: float = 0.7,
    **params_kw,
):
    """``ibm=True`` replaces the staircase velocity treatment with the
    sharp-interface direct forcing built from the circle's exact signed
    distance (ibm.py). ``sharp_pressure=True`` (requires ibm and an
    iterative/mg poisson method) additionally upgrades the PRESSURE side
    to the cut-cell apertured Poisson (cutcell.py) -- both sides sharp.
    ``spin`` (requires ibm): rotation rate alpha = omega*R/u_in of the
    cylinder surface -- the Magnus configuration (rotating cylinder
    deflects the wake and carries a mean lift). ``heated=True``: forced
    convection from an ISOTHERMAL cylinder (theta = 1 body in a theta = 0
    stream, passive scalar, alpha = nu/Pr) -- the mean Nusselt number from
    ``scalar.body_heat_flux`` / (pi alpha) validates against the
    Churchill-Bernstein correlation (tests/test_oracles.py)."""
    from . import Case

    grid = GridSpec(shape=tuple(shape), lengths=tuple(lengths), dtype=dtype or jnp.float32)
    nu = u_in * diameter / re
    solid = cylinder_mask(grid, center, diameter / 2.0)
    bcs = {
        (0, 0): BCSpec.inflow((u_in, 0.0)),
        (0, 1): (BCSpec.convective(u_in) if outlet == "convective"
                 else BCSpec.outflow()),
        (1, 0): BCSpec.slip(),
        (1, 1): BCSpec.slip(),
    }
    dt = dt if dt is not None else _stable_dt(grid, nu, 1.8 * u_in, upwind_gamma)
    params = SimParams(
        dt=dt,
        nu=nu,
        upwind_gamma=upwind_gamma,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters,
            # iterative solves warm-start from p + 0.8 (p - p_prev): the
            # unsteady wake drifts the rhs every step and the extrapolated
            # guess cuts V-cycles/step materially (docs/PARITY.md)
            extrapolate=(poisson_extrapolate
                         if poisson_method != "fft" else 0.0),
        ),
    )
    radius = diameter / 2.0
    sdf = (lambda *cs: np.sqrt(
        sum((c - c0) ** 2 for c, c0 in zip(cs, center))) - radius
    ) if ibm else None
    vel = None
    if spin:
        if not ibm:
            raise ValueError("spin (rotating cylinder) requires ibm=True")
        omega = spin * u_in / radius

        def vel(x, y):  # rigid rotation about the center
            return (-omega * (y - center[1]), omega * (x - center[0]))
    if sharp_pressure and not ibm:
        raise ValueError("sharp_pressure requires ibm=True (needs the sdf)")
    scalar = _heated_scalar(grid, nu, prandtl) if heated else None
    sim = Simulation.build(grid, bcs, params, solid=solid, sdf=sdf,
                           surface_velocity=vel,
                           sharp_pressure=sharp_pressure, scalar=scalar)
    return Case(
        name="heated_cylinder" if heated else "cylinder",
        sim=sim,
        suggested_steps=int(150.0 / dt),  # enough shedding periods for St
        description=f"cylinder Re={re} {shape}"
        + (f" heated Pr={prandtl}" if heated else ""),
    )


def _heated_scalar(grid: GridSpec, nu: float, prandtl: float):
    """Passive temperature for the heated-obstacle cases: theta = 0 free
    stream (inflow Dirichlet), zero-gradient outlet/lateral faces, theta
    = 1 isothermal body, alpha = nu/Pr."""
    from ..scalar import ScalarBC, ScalarConfig

    nd = grid.ndim
    sc_bcs = {(a, s): ScalarBC.adiabatic()
              for a in range(nd) for s in (0, 1)}
    sc_bcs[(0, 0)] = ScalarBC.dirichlet(0.0)
    return ScalarConfig(
        bcs=sc_bcs,
        diffusivity=nu / prandtl,
        body_bc=ScalarBC.dirichlet(1.0),
    )


def build_sphere(
    shape=(256, 128, 128),
    lengths=(16.0, 8.0, 8.0),
    re: float = 300.0,
    u_in: float = 1.0,
    diameter: float = 1.0,
    center=(4.0, 4.003, 3.997),  # off-axis offsets seed the instability
    dt: float | None = None,
    # dctcg measured 2.8x multigrid here (31.7 vs 89.2 ms/step at
    # 512x256x256, 1 iter/step) -- docs/PARITY.md
    poisson_method: str = "dctcg",
    poisson_tol: float = 1e-5,
    poisson_iters: int = 2000,
    upwind_gamma: float = 0.2,
    dtype=None,
    outlet: str = "outflow",
    poisson_extrapolate: float = 0.8,
    ibm: bool = False,
    spin: float = 0.0,
    sharp_pressure: bool = False,
    heated: bool = False,
    prandtl: float = 0.7,
    **params_kw,
):
    """Flow past a sphere (the 3D analog of the cylinder case).

    ``spin`` (requires ibm): rotation rate alpha = omega*R/u_in about the
    z axis -- the 3D rotating-body/Magnus configuration, riding the
    moving-boundary IBM (wet faces carry the surface velocity).

    Same topology class as BASELINE config #3 -- inflow/outflow + interior
    obstacle -- extended to 3D; at Re=300 the wake is unsteady (planar-
    symmetric vortex shedding, St ~ 0.135). ``cylinder_mask`` is rank-
    generic, so the solid is the same construction with a 3-vector center.
    """
    from . import Case

    grid = GridSpec(shape=tuple(shape), lengths=tuple(lengths),
                    dtype=dtype or jnp.float32)
    nu = u_in * diameter / re
    solid = cylinder_mask(grid, center, diameter / 2.0)
    bcs = {
        (0, 0): BCSpec.inflow((u_in, 0.0, 0.0)),
        (0, 1): (BCSpec.convective(u_in) if outlet == "convective"
                 else BCSpec.outflow()),
        (1, 0): BCSpec.slip(),
        (1, 1): BCSpec.slip(),
        (2, 0): BCSpec.slip(),
        (2, 1): BCSpec.slip(),
    }
    dt = dt if dt is not None else _stable_dt(grid, nu, 1.8 * u_in, upwind_gamma)
    params = SimParams(
        dt=dt,
        nu=nu,
        upwind_gamma=upwind_gamma,
        **params_kw,
        poisson=PoissonConfig(
            method=poisson_method, tol=poisson_tol, max_iters=poisson_iters,
            extrapolate=(poisson_extrapolate
                         if poisson_method != "fft" else 0.0),
        ),
    )
    radius = diameter / 2.0
    sdf = (lambda *cs: np.sqrt(
        sum((c - c0) ** 2 for c, c0 in zip(cs, center))) - radius
    ) if ibm else None
    vel = None
    if spin:
        if not ibm:
            raise ValueError("spin (rotating sphere) requires ibm=True")
        omega = spin * u_in / radius

        def vel(x, y, z):  # rigid rotation about the z axis
            return (-omega * (y - center[1]), omega * (x - center[0]),
                    np.zeros_like(z))
    if sharp_pressure and not ibm:
        raise ValueError("sharp_pressure requires ibm=True (needs the sdf)")
    scalar = _heated_scalar(grid, nu, prandtl) if heated else None
    sim = Simulation.build(grid, bcs, params, solid=solid, sdf=sdf,
                           surface_velocity=vel,
                           sharp_pressure=sharp_pressure, scalar=scalar)
    return Case(
        name="sphere",
        sim=sim,
        suggested_steps=int(150.0 / dt),
        description=f"sphere Re={re} {shape}"
        + (f" heated Pr={prandtl}" if heated else ""),
    )


def impulsive_start_state(sim: Simulation, u_in: float = 1.0) -> State:
    """Uniform free-stream initial condition (masked in the solid)."""
    grid = sim.grid
    st = sim.initial_state()
    u0 = jnp.full(grid.face_shape(0), u_in, dtype=grid.dtype)
    from .. import bcs as bcs_mod

    u = bcs_mod.apply_velocity_bcs(
        grid, sim.bcs, (u0, *st.u[1:]), sim.face_masks
    )
    return State(u=u, p=st.p, p_prev=st.p_prev)
