"""Smagorinsky LES subgrid model on the staggered (MAC) grid.

Large-eddy simulation closure: the resolved strain-rate tensor sets a local
eddy viscosity

    nu_t = (Cs * Delta)^2 * |S|,      |S| = sqrt(2 S_ij S_ij),

and the subgrid stress divergence  F_i = d/dx_j ( 2 nu_t S_ij )  is added to
the momentum predictor as a per-face forcing term. Capability extension
beyond the reference scope (the reference mount was empty -- SURVEY.md SS0;
no LES capability is claimed there): this makes the high-Re turbulence cases
(decaying_turbulence, taylor_green at large Re) physically meaningful when
the grid does not resolve the dissipation range.

Staggering (everything follows grid.py's MAC layout):
  * S_aa lives at cell centers: the own-axis derivative of component ``a``
    needs no ghost values (boundary faces are in-array).
  * S_ab (a != b) lives at the "edge" points that are integer in axes a and
    b and half-integer elsewhere (2D: nodes); both cross-derivatives land
    there naturally, with tangential ghosts from :func:`bcs.pad_transverse`
    (wall reflection through the Dirichlet value / periodic wrap / outflow
    zero-gradient -- the same ghost convention as the viscous stencil).
  * nu_t is computed at centers and averaged to the S_ab points; beyond a
    wall it is edge-replicated (zero normal gradient), across a periodic
    face it wraps.
  * F_a comes out on the interior faces of component ``a`` (all n distinct
    faces when axis a is periodic) -- exactly the shape
    :func:`ops.stencils.predictor` expects of a forcing term.

Discrete identity used by the tests: with nu_t held constant and a field
that is discretely divergence-free, differences commute, so
``div(2 nu_t S) == nu_t * laplacian`` exactly (to roundoff) -- the full
staggered bookkeeping is verified against ops/stencils.laplacian_component.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .bcs import BCTable, pad_transverse, periodic_axes
from .grid import GridSpec

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LESConfig:
    """Smagorinsky model parameters.

    Attributes:
      cs:    Smagorinsky constant (0.1-0.2 typical; 0.17 is the classical
             Lilly value for homogeneous isotropic turbulence). Ignored by
             the dynamic model.
      delta: filter width. ``None`` = geometric mean of the grid spacings
             (the standard choice (dx*dy(*dz))^(1/nd) on anisotropic grids).
      model: "smagorinsky" (static cs) or "dynamic" (Germano-Lilly: the
             coefficient is computed each stage from the resolved field via
             the Germano identity with a 2x test filter and a global
             least-squares average -- it vanishes on well-resolved laminar
             fields and needs no tuning).
      cs2_max: stability clip for the dynamic coefficient (Cs^2; 0.09
             corresponds to Cs = 0.3, well above any physical value).
    """

    cs: float = 0.17
    delta: Optional[float] = None
    model: str = "smagorinsky"
    cs2_max: float = 0.09

    def filter_width(self, grid: GridSpec) -> float:
        if self.delta is not None:
            return float(self.delta)
        h = grid.spacing
        prod = 1.0
        for v in h:
            prod *= v
        return float(prod ** (1.0 / grid.ndim))


def _sl(nd: int, axis: int, s: slice) -> tuple:
    idx: list = [slice(None)] * nd
    idx[axis] = s
    return tuple(idx)


def _diff(arr: Array, axis: int, h: float) -> Array:
    nd = arr.ndim
    return (arr[_sl(nd, axis, slice(1, None))]
            - arr[_sl(nd, axis, slice(0, -1))]) / h


def _avg(arr: Array, axis: int) -> Array:
    nd = arr.ndim
    return 0.5 * (arr[_sl(nd, axis, slice(1, None))]
                  + arr[_sl(nd, axis, slice(0, -1))])


def strain_rates(
    grid: GridSpec, bcs: BCTable, u: Sequence[Array]
) -> tuple[list[Array], dict[tuple[int, int], Array]]:
    """All distinct components of the resolved strain-rate tensor.

    Returns ``(diag, off)`` where ``diag[a] = S_aa`` at cell centers and
    ``off[(a, b)] = S_ab`` (a < b) at the integer-(a,b) edge points
    (shape: n+1 along axes a and b, n elsewhere).
    """
    nd = grid.ndim
    h = grid.spacing
    diag = [_diff(u[a], a, h[a]) for a in range(nd)]
    off: dict[tuple[int, int], Array] = {}
    for a in range(nd):
        for b in range(a + 1, nd):
            # du_a/dx_b at the (a,b) edge: ghost-pad a's transverse axes,
            # difference along b, then strip the pad from the axes that are
            # neither a nor b (they must stay at cell-center extent).
            pa = _diff(pad_transverse(grid, bcs, a, u[a]), b, h[b])
            pb = _diff(pad_transverse(grid, bcs, b, u[b]), a, h[a])
            for c in range(nd):
                if c != a and c != b:
                    pa = pa[_sl(nd, c, slice(1, -1))]
                    pb = pb[_sl(nd, c, slice(1, -1))]
            off[(a, b)] = 0.5 * (pa + pb)
    return diag, off


def _off_at_centers(off_ab: Array, a: int, b: int) -> Array:
    return _avg(_avg(off_ab, a), b)


def _center_strain_tensor(
    grid: GridSpec, bcs: BCTable, u: Sequence[Array], raw=None
) -> tuple[dict[tuple[int, int], Array], Array]:
    """The full strain tensor collocated at cell centers (off-diagonal
    entries averaged from their edge points) and its magnitude
    ``|S| = sqrt(2 S_ij S_ij)``. ``raw`` short-circuits the staggered
    strain computation with a precomputed :func:`strain_rates` result."""
    nd = grid.ndim
    diag, off = raw if raw is not None else strain_rates(grid, bcs, u)
    S = {(a, a): diag[a] for a in range(nd)}
    for (a, b), s_ab in off.items():
        S[(a, b)] = _off_at_centers(s_ab, a, b)
    s2 = sum(S[(a, a)] * S[(a, a)] for a in range(nd))
    for a in range(nd):
        for b in range(a + 1, nd):
            s2 = s2 + 2.0 * S[(a, b)] * S[(a, b)]
    return S, jnp.sqrt(2.0 * s2)


def test_filter(grid: GridSpec, bcs: BCTable, f: Array) -> Array:
    """2x top-hat test filter of a cell-centered field: the separable
    trapezoidal kernel [1/4, 1/2, 1/4] per axis (wrap on periodic axes,
    edge-replicate otherwise). Preserves constants exactly."""
    nd = f.ndim
    for ax in range(grid.ndim):
        fp = _pad_cells(grid, bcs, f, ax)
        f = (0.25 * fp[_sl(nd, ax, slice(0, -2))]
             + 0.5 * fp[_sl(nd, ax, slice(1, -1))]
             + 0.25 * fp[_sl(nd, ax, slice(2, None))])
    return f


def _centered_velocity(grid: GridSpec, u: Sequence[Array]) -> list[Array]:
    """Velocity components averaged from their faces to cell centers.
    Periodic components carry the duplicate wrap face, so the plain
    adjacent-pair average covers every cell in both closures."""
    return [_avg(u[a], a) for a in range(grid.ndim)]


def dynamic_cs2(
    grid: GridSpec, bcs: BCTable, u: Sequence[Array], cfg: LESConfig,
    strains=None,
) -> Array:
    """Germano-Lilly dynamic coefficient ``Cs^2`` (one scalar, computed
    from the resolved field each stage).

    Germano identity with a 2x test filter F (so alpha^2 = 4), everything
    collocated at cell centers:

        L_ij = F(u_i u_j) - F(u_i) F(u_j)           (resolved Leonard)
        M_ij = 2 Delta^2 [ F(|S| S_ij) - 4 |S~| S~_ij ]
        Cs^2 = < L_ij M_ij > / < M_ij M_ij >        (global least squares)

    with the common structured-grid simplification S~_ij = F(S_ij) (test-
    filtered strains instead of strains of the filtered field). The global
    average makes the coefficient a scalar -- robust (no local negative
    viscosity blowups) and exactly what the decaying-isotropic-turbulence
    cases call for; clipped to [0, cs2_max]. On a well-resolved laminar
    field the identity is satisfied by Cs ~ 0, so the model self-quenches
    (tested against the Taylor-Green vortex). Note the 2D behavior: 2D
    turbulence transfers energy UPSCALE (inverse cascade), <L:M> comes out
    (slightly) negative on developed 2D fields, and the clipped
    coefficient is zero -- the dynamic model correctly refuses to add
    forward-scatter dissipation in 2D; use the static model there if
    subgrid drain is wanted (e.g. as an enstrophy sink).
    """
    nd = grid.ndim
    dt_ = grid.dtype
    S, mag = (strains if strains is not None
              else _center_strain_tensor(grid, bcs, u))
    uc = _centered_velocity(grid, u)
    fuc = [test_filter(grid, bcs, c) for c in uc]
    Sf = {k: test_filter(grid, bcs, v) for k, v in S.items()}
    s2f = sum(Sf[(a, a)] * Sf[(a, a)] for a in range(nd))
    for a in range(nd):
        for b in range(a + 1, nd):
            s2f = s2f + 2.0 * Sf[(a, b)] * Sf[(a, b)]
    magf = jnp.sqrt(2.0 * s2f)
    delta2 = jnp.asarray(cfg.filter_width(grid) ** 2, dt_)
    num = jnp.zeros((), dt_)
    den = jnp.zeros((), dt_)
    for a in range(nd):
        for b in range(a, nd):
            mult = 1.0 if a == b else 2.0  # symmetric-tensor multiplicity
            L = (test_filter(grid, bcs, uc[a] * uc[b]) - fuc[a] * fuc[b])
            M = 2.0 * delta2 * (
                test_filter(grid, bcs, mag * S[(a, b)])
                - 4.0 * magf * Sf[(a, b)]
            )
            num = num + mult * jnp.sum(L * M)
            den = den + mult * jnp.sum(M * M)
    cs2 = num / jnp.maximum(den, jnp.asarray(1e-30, dt_))
    return jnp.clip(cs2, 0.0, cfg.cs2_max)


def eddy_viscosity(
    grid: GridSpec, bcs: BCTable, u: Sequence[Array], cfg: LESConfig,
    raw_strains=None,
) -> Array:
    """Cell-centered Smagorinsky eddy viscosity ``Cs^2 Delta^2 |S|``
    (static ``cs``, or the Germano-Lilly dynamic coefficient)."""
    S, mag = _center_strain_tensor(grid, bcs, u, raw=raw_strains)
    if cfg.model == "dynamic":
        cs2 = dynamic_cs2(grid, bcs, u, cfg, strains=(S, mag))
    elif cfg.model == "smagorinsky":
        cs2 = jnp.asarray(cfg.cs * cfg.cs, grid.dtype)
    else:
        raise ValueError(f"unknown LES model {cfg.model!r}")
    scale = cs2 * cfg.filter_width(grid) ** 2
    return (scale * mag).astype(grid.dtype)


def _pad_cells(
    grid: GridSpec, bcs: BCTable, arr: Array, axis: int
) -> Array:
    """One ghost cell on each side along ``axis``: wrap when periodic,
    edge-replicate (zero normal gradient) otherwise."""
    nd = arr.ndim
    if periodic_axes(grid, bcs)[axis]:
        lo = arr[_sl(nd, axis, slice(-1, None))]
        hi = arr[_sl(nd, axis, slice(0, 1))]
    else:
        lo = arr[_sl(nd, axis, slice(0, 1))]
        hi = arr[_sl(nd, axis, slice(-1, None))]
    return jnp.concatenate([lo, arr, hi], axis=axis)


def sgs_forcing(
    grid: GridSpec,
    bcs: BCTable,
    u: Sequence[Array],
    cfg: LESConfig,
    nu_t: Optional[Array] = None,
) -> tuple[Array, ...]:
    """Subgrid momentum forcing ``F_a = d/dx_b (2 nu_t S_ab)`` per component.

    Shapes match :func:`ops.stencils.predictor`'s forcing contract: interior
    faces along each component's own axis (all n distinct faces when that
    axis is periodic), full cell extent on the others.

    ``nu_t`` overrides the Smagorinsky viscosity with a fixed cell-centered
    array (used by the constant-viscosity consistency tests).
    """
    nd = grid.ndim
    h = grid.spacing
    per = periodic_axes(grid, bcs)
    diag, off = strain_rates(grid, bcs, u)
    if nu_t is None:
        nu_t = eddy_viscosity(grid, bcs, u, cfg, raw_strains=(diag, off))

    # nu_t at the (a,b) edge points: pad one ghost cell along a and b, then
    # average the 4 surrounding centers.
    def nu_at_edge(a: int, b: int) -> Array:
        x = _pad_cells(grid, bcs, nu_t, a)
        x = _pad_cells(grid, bcs, x, b)
        return _avg(_avg(x, a), b)

    out = []
    for a in range(nd):
        # Diagonal: d/dx_a (2 nu_t S_aa), centers -> faces of a.
        tau = 2.0 * nu_t * diag[a]
        if per[a]:
            tau = jnp.concatenate(
                [tau[_sl(nd, a, slice(-1, None))], tau], axis=a
            )
        f = _diff(tau, a, h[a])
        # Off-diagonal: d/dx_b (2 nu_t S_ab), edges -> faces of a.
        for b in range(nd):
            if b == a:
                continue
            key = (min(a, b), max(a, b))
            tau_ab = 2.0 * nu_at_edge(*key) * off[key]
            g = _diff(tau_ab, b, h[b])
            # Along axis a the edge points sit at ALL faces 0..n; keep the
            # interior ones (wall axes) or faces 0..n-1 (periodic axes,
            # where face n duplicates face 0).
            g = g[_sl(nd, a, slice(None, -1) if per[a] else slice(1, -1))]
            f = f + g
        out.append(f.astype(grid.dtype))
    return tuple(out)
