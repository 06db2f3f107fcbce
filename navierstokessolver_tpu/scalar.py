"""Transported scalar (temperature / concentration) with Boussinesq buoyancy.

Capability extension beyond the reference solver (SURVEY.md records no
scalar transport in `shivams15/navierstokessolver`): an advected-diffused
cell-centered scalar

    d(theta)/dt = -div(u * theta) + alpha * lap(theta)

in conservative (flux) form on the MAC grid -- the face-normal velocities
ARE the flux velocities, so discrete conservation is exact up to boundary
fluxes -- plus optional Boussinesq coupling back into momentum,

    f_a = g_a * beta * (theta - theta_ref)

interpolated to component-a faces. Validated against the de Vahl Davis
(1983) natural-convection benchmark (tests/test_scalar.py).

Scalar BCs per face: Dirichlet (prescribed wall value, ghost = 2*value -
edge), adiabatic/zero-flux Neumann (ghost = edge), or periodic wrap --
mirroring the velocity BC ghost conventions in bcs.py.

Immersed obstacles (``body_bc``): the scalar composes with the staircase
solid-cell mask. An ISOTHERMAL body (``ScalarBC.dirichlet(value)``) clamps
solid cells to the body value, so the diffusive face flux at every
fluid-solid interface is the first-order staircase Dirichlet flux
``alpha (value - theta_fluid) / h`` (the same treatment class as the
velocity staircase masks; the advective flux there is already zero because
the face-normal velocity is masked). An ADIABATIC body
(``ScalarBC.adiabatic()``) closes the diffusive flux on every fluid-solid
face instead, making the discrete scalar budget exactly conservative
around the body. Solid-cell values are frozen across the update either
way (``freeze_body``). ``body_heat_flux`` integrates the interface fluxes
-- the Nusselt-number diagnostic for heated-obstacle cases
(cases/cylinder.py ``heated=True``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from .grid import GridSpec

Array = jax.Array
Value = Union[float, Array]


class ScalarBCKind(enum.Enum):
    DIRICHLET = "dirichlet"      # prescribed boundary value (hot/cold wall)
    NEUMANN = "neumann"          # zero-flux (adiabatic/insulated)
    PERIODIC = "periodic"


@dataclasses.dataclass(frozen=True)
class ScalarBC:
    kind: ScalarBCKind
    value: Value = 0.0

    @staticmethod
    def dirichlet(value: Value) -> "ScalarBC":
        return ScalarBC(ScalarBCKind.DIRICHLET, value)

    @staticmethod
    def adiabatic() -> "ScalarBC":
        return ScalarBC(ScalarBCKind.NEUMANN)

    @staticmethod
    def periodic() -> "ScalarBC":
        return ScalarBC(ScalarBCKind.PERIODIC)


ScalarBCTable = Mapping[tuple[int, int], ScalarBC]


@dataclasses.dataclass(eq=False)
class ScalarConfig:
    """Static configuration of the transported scalar.

    diffusivity: alpha (e.g. nu/Pr for temperature).
    buoyancy: per-axis g_a * beta coefficients of the Boussinesq forcing
      (e.g. (0.0, 1.0) for gravity along -y with g*beta = 1); zeros disable
      the momentum coupling (passive scalar).
    theta_ref: reference value subtracted inside the forcing.
    upwind_gamma: donor-cell blend for the advective flux (0 = central).
    body_bc: scalar condition on an immersed obstacle's staircase surface
      -- ``ScalarBC.dirichlet(v)`` (isothermal body at v) or
      ``ScalarBC.adiabatic()`` (insulated body). REQUIRED when the
      simulation carries a solid mask (Simulation.build raises otherwise:
      silently diffusing through the body would be wrong physics).
    """

    bcs: ScalarBCTable
    diffusivity: float
    buoyancy: tuple[float, ...] = ()
    theta_ref: float = 0.0
    upwind_gamma: float = 0.0
    # Initial scalar field (cell-centered array); None -> zeros.
    theta_init: Optional[Array] = None
    body_bc: Optional[ScalarBC] = None

    def validate(self, grid: GridSpec) -> None:
        if self.body_bc is not None and self.body_bc.kind not in (
            ScalarBCKind.DIRICHLET, ScalarBCKind.NEUMANN
        ):
            raise ValueError(
                "body_bc must be dirichlet (isothermal) or neumann "
                "(adiabatic)"
            )
        for a in range(grid.ndim):
            for side in (0, 1):
                if (a, side) not in self.bcs:
                    raise ValueError(
                        f"missing scalar BC for face (axis={a}, side={side})"
                    )
            lo = self.bcs[(a, 0)].kind is ScalarBCKind.PERIODIC
            hi = self.bcs[(a, 1)].kind is ScalarBCKind.PERIODIC
            if lo != hi:
                raise ValueError(f"axis {a}: PERIODIC scalar BC on one side")
        if self.buoyancy and len(self.buoyancy) != grid.ndim:
            raise ValueError("buoyancy rank mismatch")


def _sl(nd: int, axis: int, s) -> tuple:
    idx = [slice(None)] * nd
    idx[axis] = s
    return tuple(idx)


def pad_scalar(grid: GridSpec, cfg: ScalarConfig, theta: Array) -> Array:
    """One ghost cell per side on every axis, honoring the scalar BCs."""
    nd = grid.ndim
    for a in range(nd):
        lo = cfg.bcs[(a, 0)]
        hi = cfg.bcs[(a, 1)]
        if lo.kind is ScalarBCKind.PERIODIC:
            g_lo = theta[_sl(nd, a, slice(-1, None))]
            g_hi = theta[_sl(nd, a, slice(0, 1))]
        else:
            e_lo = theta[_sl(nd, a, slice(0, 1))]
            e_hi = theta[_sl(nd, a, slice(-1, None))]
            if lo.kind is ScalarBCKind.DIRICHLET:
                g_lo = 2.0 * jnp.asarray(lo.value, theta.dtype) - e_lo
            else:
                g_lo = e_lo
            if hi.kind is ScalarBCKind.DIRICHLET:
                g_hi = 2.0 * jnp.asarray(hi.value, theta.dtype) - e_hi
            else:
                g_hi = e_hi
        theta = jnp.concatenate([g_lo, theta, g_hi], axis=a)
    return theta


def _face_open(nd: int, solid: Array, a: int) -> Array:
    """Fluid-face mask over the n+1 theta-faces along axis ``a``: a face
    is open iff both adjacent cells are fluid (domain ghosts count as
    fluid -- the domain scalar BCs govern those faces)."""
    fluid = jnp.logical_not(solid)
    pad = [(0, 0)] * nd
    pad[a] = (1, 1)
    fp = jnp.pad(fluid, pad, constant_values=True)
    return jnp.logical_and(
        fp[_sl(nd, a, slice(0, -1))], fp[_sl(nd, a, slice(1, None))]
    )


def freeze_body(cfg: ScalarConfig, theta: Array,
                solid: Optional[Array]) -> Array:
    """Clamp solid cells: to the body value (isothermal body) or to their
    current value via the caller re-imposing after updates (adiabatic --
    the caller passes the pre-update field through ``jnp.where``; here the
    Dirichlet clamp is the only state change)."""
    if solid is None or cfg.body_bc is None:
        return theta
    if cfg.body_bc.kind is ScalarBCKind.DIRICHLET:
        return jnp.where(
            solid, jnp.asarray(cfg.body_bc.value, theta.dtype), theta
        )
    return theta


def scalar_rhs(
    grid: GridSpec,
    cfg: ScalarConfig,
    u: Sequence[Array],
    theta: Array,
    solid: Optional[Array] = None,
) -> Array:
    """``-div(u theta) + alpha lap(theta)`` at cell centers.

    Flux form on the MAC grid: the face flux along axis a is
    ``u_a * theta_face`` with ``theta_face`` the two-cell average (blended
    with donor-cell upwinding by ``upwind_gamma``); wall faces see the
    ghost-cell average, which reproduces the Dirichlet wall value exactly
    and a zero diffusive+advective wall flux for adiabatic walls (the
    face-normal velocity there is 0 for solid walls). The diffusive term
    is assembled in the same face-flux form (identical to the 3-point
    Laplacian where every face is open), so an immersed obstacle
    (``solid`` + ``cfg.body_bc``) composes per face: an adiabatic body
    closes the diffusive flux on fluid-solid faces; an isothermal body
    keeps it open against the clamped solid-cell value (the first-order
    staircase Dirichlet flux). Advective interface fluxes are zero either
    way -- the face-normal velocity is masked at solid faces.
    """
    nd = grid.ndim
    h = grid.spacing
    if solid is not None and cfg.body_bc is not None \
            and cfg.body_bc.kind is ScalarBCKind.DIRICHLET:
        theta = freeze_body(cfg, theta, solid)
    close_body = (solid is not None and cfg.body_bc is not None
                  and cfg.body_bc.kind is ScalarBCKind.NEUMANN)
    tp = pad_scalar(grid, cfg, theta)    # one ghost per side, every axis
    core = tuple(slice(1, -1) for _ in range(nd))
    out = jnp.zeros_like(theta)
    gamma = cfg.upwind_gamma
    for a in range(nd):
        # theta at the n+1 faces along axis a (other axes: core slice)
        idx_m = list(core)
        idx_p = list(core)
        idx_m[a] = slice(0, -1)
        idx_p[a] = slice(1, None)
        t_m = tp[tuple(idx_m)]           # cell below each face
        t_p = tp[tuple(idx_p)]           # cell above each face
        t_face = 0.5 * (t_m + t_p)
        ua = u[a]                        # n+1 faces (periodic: dup face n)
        if gamma > 0.0:
            t_up = jnp.where(ua > 0.0, t_m, t_p)
            t_face = gamma * t_up + (1.0 - gamma) * t_face
        flux = ua * t_face
        # diffusive face flux: alpha * (t_p - t_m) / h (flux form of the
        # 3-point Laplacian; maskable per face)
        dflux = cfg.diffusivity * (t_p - t_m) / h[a]
        if close_body:
            dflux = dflux * _face_open(nd, solid, a).astype(dflux.dtype)
        net = dflux - flux
        # d(theta)/dt += (net[i+1] - net[i]) / h
        out = out + (net[_sl(nd, a, slice(1, None))]
                     - net[_sl(nd, a, slice(0, -1))]) / h[a]
    return out


def body_heat_flux(
    grid: GridSpec,
    cfg: ScalarConfig,
    theta: Array,
    solid: Array,
) -> Array:
    """Total diffusive flux from the body INTO the fluid (the integrated
    staircase-surface heat flux): sum over fluid-solid interface faces of
    ``alpha (theta_solid - theta_fluid) / h * face_area``. For an
    isothermal body the solid side reads the body value (clamped). The
    2D-cylinder mean Nusselt number is ``Q / (pi alpha dT)`` for diameter
    D=1 (Nu = h_avg D / k with q' = h_avg dT pi D and k = alpha in the
    nondimensional theta equation)."""
    nd = grid.ndim
    h = grid.spacing
    theta = freeze_body(cfg, theta, solid)
    fluid = jnp.logical_not(solid)
    vol = 1.0
    for a in range(nd):
        vol = vol * h[a]
    q = jnp.zeros((), theta.dtype)
    for a in range(nd):
        area = vol / h[a]
        t_lo = theta[_sl(nd, a, slice(0, -1))]
        t_hi = theta[_sl(nd, a, slice(1, None))]
        s_lo = solid[_sl(nd, a, slice(0, -1))]
        s_hi = solid[_sl(nd, a, slice(1, None))]
        f_lo = fluid[_sl(nd, a, slice(0, -1))]
        f_hi = fluid[_sl(nd, a, slice(1, None))]
        # solid below / fluid above: flux into the upper (fluid) cell
        up = jnp.logical_and(s_lo, f_hi).astype(theta.dtype) \
            * (t_lo - t_hi)
        # fluid below / solid above
        dn = jnp.logical_and(f_lo, s_hi).astype(theta.dtype) \
            * (t_hi - t_lo)
        q = q + cfg.diffusivity * area / h[a] * jnp.sum(up + dn)
    return q


def buoyancy_forcing(
    grid: GridSpec,
    cfg: ScalarConfig,
    theta: Array,
) -> Optional[tuple[Optional[Array], ...]]:
    """Boussinesq momentum forcing per component at its interior faces:
    ``f_a = g_a beta (theta - theta_ref)`` averaged to component-a faces
    (matching the predictor's interior-face shape contract)."""
    if not cfg.buoyancy or all(b == 0.0 for b in cfg.buoyancy):
        return None
    nd = grid.ndim
    dev = theta - jnp.asarray(cfg.theta_ref, theta.dtype)
    out: list[Optional[Array]] = []
    for a in range(nd):
        coef = cfg.buoyancy[a]
        if coef == 0.0:
            out.append(None)
            continue
        f = 0.5 * (
            dev[_sl(nd, a, slice(0, -1))] + dev[_sl(nd, a, slice(1, None))]
        )
        out.append(coef * f)
    return tuple(out)
