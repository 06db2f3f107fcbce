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
    """

    bcs: ScalarBCTable
    diffusivity: float
    buoyancy: tuple[float, ...] = ()
    theta_ref: float = 0.0
    upwind_gamma: float = 0.0
    # Initial scalar field (cell-centered array); None -> zeros.
    theta_init: Optional[Array] = None

    def validate(self, grid: GridSpec) -> None:
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


def scalar_rhs(
    grid: GridSpec,
    cfg: ScalarConfig,
    u: Sequence[Array],
    theta: Array,
) -> Array:
    """``-div(u theta) + alpha lap(theta)`` at cell centers.

    Flux form on the MAC grid: the face flux along axis a is
    ``u_a * theta_face`` with ``theta_face`` the two-cell average (blended
    with donor-cell upwinding by ``upwind_gamma``); wall faces see the
    ghost-cell average, which reproduces the Dirichlet wall value exactly
    and a zero diffusive+advective wall flux for adiabatic walls (the
    face-normal velocity there is 0 for solid walls).
    """
    nd = grid.ndim
    h = grid.spacing
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
        # advective: -(flux[i+1] - flux[i]) / h
        d = (flux[_sl(nd, a, slice(1, None))]
             - flux[_sl(nd, a, slice(0, -1))]) / h[a]
        out = out - d
        # diffusive: alpha * (t[i-1] - 2 t[i] + t[i+1]) / h^2
        idx_c = list(core)
        idx_lo = list(core)
        idx_hi = list(core)
        idx_lo[a] = slice(0, -2)
        idx_hi[a] = slice(2, None)
        lap = (tp[tuple(idx_lo)] - 2.0 * tp[tuple(idx_c)]
               + tp[tuple(idx_hi)])
        out = out + cfg.diffusivity * lap / (h[a] * h[a])
    return out


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
