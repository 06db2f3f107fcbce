"""Cut-cell (apertured) sharp-interface pressure treatment.

The staircase Poisson masking represents a curved body as fully-blocked
faces between cell-center-classified solid/fluid cells -- first-order in h
and the leading error term at curved boundaries once the VELOCITY side is
sharp (ibm.py direct forcing; docs/PARITY.md Cd convergence table). This
module upgrades the PRESSURE side to a cut-cell finite volume: each cell
face carries an aperture alpha in [0, 1] (its fluid-open fraction, from
the signed distance field), and

  * the Poisson operator becomes  (A p)_i = sum_f alpha_f (p_nb - p_i)/h^2
    (ops/poisson.PoissonOp.ap; still matrix-free, still symmetric --
    alpha is shared by the two cells it separates);
  * the divergence / Poisson RHS becomes the apertured flux sum
    sum_a (alpha_hi u_hi - alpha_lo u_lo)/h_a  (:func:`divergence_ap`);
  * the velocity correction applies the plain face gradient on every face
    with alpha > 0 (the existing corr_masks mechanism).

Together these keep the projection EXACT: div_ap(u_new) = div_ap(u*) -
(dt/rho) A p = 0 to solver tolerance, by construction. Solid cells
(volume fraction 0 or no open face) keep identity rows.

Capability class: standard cut-cell/embedded-boundary Poisson (public
numerics); the reference mount was empty this session (SURVEY.md SS0) so
there is no reference counterpart to cite -- this extends the SURVEY SS2
"obstacle mask" row's accuracy beyond the reference class.

TPU-first: apertures are computed ONCE at build time in numpy (face
subsampling of the SDF -- exact to O(1/k^2), no geometry code on device);
the per-iteration cost over the staircase operator is two extra f32
coefficient reads per axis, and everything stays branch-free inside the
same lax.while_loop solvers.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .grid import GridSpec

# faces with aperture below this are treated as closed (kills the
# small-cell stiffness of nearly-grazing cuts; the velocity there is
# zeroed by the face mask, so no flux is lost from the discrete system)
ALPHA_MIN = 0.01


def _face_samples(grid: GridSpec, axis: int, k: int):
    """Coordinate arrays sampling each face normal to ``axis`` with a
    k^(nd-1) stencil (midpoint subcells), broadcast-ready."""
    nd = grid.ndim
    h = grid.spacing
    coords = []
    for d in range(nd):
        n = grid.shape[d]
        if d == axis:
            c = np.arange(n + 1, dtype=np.float64) * h[d]
        else:
            base = np.arange(n, dtype=np.float64) * h[d]
            sub = (np.arange(k, dtype=np.float64) + 0.5) * (h[d] / k)
            c = (base[:, None] + sub[None, :]).ravel()   # n*k samples
        shape = [1] * nd
        shape[d] = -1
        coords.append(c.reshape(shape))
    return coords


def face_apertures(
    grid: GridSpec, sdf: Callable, k: int = 8
) -> tuple[np.ndarray, ...]:
    """Per-axis FULL face-aperture arrays (shape = grid.face_shape(a)):
    the fluid fraction (sdf > 0) of each face, by k^(nd-1) midpoint
    subsampling. Exact for faces fully in/out. On CUT faces the counting
    estimator of a discontinuous indicator has O(1/k) worst-case error
    per face (the O(1/k^2) rate holds only in an averaged sense over many
    faces -- ADVICE r3); an exact-for-planar-cuts alternative would
    reconstruct the aperture from the SDF's linear interpolant instead
    of counting subsamples."""
    nd = grid.ndim
    h = grid.spacing
    out = []
    for a in range(nd):
        phi = np.asarray(sdf(*_face_samples(grid, a, k)), np.float64)
        full_shape = tuple(
            (grid.shape[d] + 1) if d == a else grid.shape[d] * k
            for d in range(nd)
        )
        phi = np.broadcast_to(phi, full_shape)
        frac = (phi > 0.0).astype(np.float64)
        # average the k subsamples along every transverse axis
        for d in range(nd):
            if d == a:
                continue
            sh = list(frac.shape)
            n = sh[d] // k
            sh[d] = n
            sh.insert(d + 1, k)
            frac = frac.reshape(sh).mean(axis=d + 1)
        alpha = frac
        # consistency with the IBM velocity treatment: a face whose
        # CENTER is inside the body has its velocity DOF forced toward
        # the body value (ibm.py clamps w = phi_f/phi_nbr to 0 there), so
        # keeping a partial aperture open on it would count a systematic
        # flux deficit into the continuity equation -- close it. The open
        # set then matches where the velocity DOF is meaningful (alpha of
        # surviving cut faces is in ~(0.5, 1]).
        centers = []
        for d in range(nd):
            if d == a:
                c = np.arange(grid.shape[d] + 1, dtype=np.float64) * h[d]
            else:
                c = (np.arange(grid.shape[d], dtype=np.float64) + 0.5) * h[d]
            shp = [1] * nd
            shp[d] = -1
            centers.append(c.reshape(shp))
        phi_c = np.broadcast_to(
            np.asarray(sdf(*centers), np.float64), alpha.shape
        )
        alpha = np.where(phi_c > 0.0, alpha, 0.0)
        alpha[alpha < ALPHA_MIN] = 0.0
        out.append(alpha)
    return tuple(out)


def volume_fractions(
    grid: GridSpec, sdf: Callable, k: int = 4
) -> np.ndarray:
    """Cell fluid-volume fractions by k^nd midpoint subsampling."""
    nd = grid.ndim
    h = grid.spacing
    coords = []
    for d in range(nd):
        base = np.arange(grid.shape[d], dtype=np.float64) * h[d]
        sub = (np.arange(k, dtype=np.float64) + 0.5) * (h[d] / k)
        c = (base[:, None] + sub[None, :]).ravel()
        shape = [1] * nd
        shape[d] = -1
        coords.append(c.reshape(shape))
    phi = np.asarray(sdf(*coords), np.float64)
    frac = np.broadcast_to(
        (phi > 0.0).astype(np.float64),
        tuple(grid.shape[d] * k for d in range(nd)),
    )
    for d in range(nd):
        sh = list(frac.shape)
        n = sh[d] // k
        sh[d] = n
        sh.insert(d + 1, k)
        frac = frac.reshape(sh).mean(axis=d + 1)
    return frac


def cut_geometry(grid: GridSpec, sdf: Callable, k: int = 8):
    """(apertures, fluid, solid): the consistent cut-cell classification.

    A cell is FLUID iff it has positive volume fraction AND at least one
    open face (isolated slivers become solid); apertures of faces touching
    a solid cell are closed so the operator/divergence/masks all agree.
    """
    nd = grid.ndim

    def inner_sl(a):
        s = [slice(None)] * nd
        s[a] = slice(1, -1)
        return tuple(s)

    def lo_sl(a):   # cell's low face / low-side neighbor cell
        s = [slice(None)] * nd
        s[a] = slice(0, -1)
        return tuple(s)

    def hi_sl(a):
        s = [slice(None)] * nd
        s[a] = slice(1, None)
        return tuple(s)

    ap = [a.copy() for a in face_apertures(grid, sdf, k)]
    vol = volume_fractions(grid, sdf, max(4, k // 2))
    fluid = vol > 0.0
    # fixed point: close faces touching a solid cell; a fluid cell with no
    # remaining open face becomes solid (isolated sliver) -> repeat
    while True:
        for a in range(nd):
            both = fluid[lo_sl(a)] & fluid[hi_sl(a)]
            ap[a][inner_sl(a)] *= both.astype(np.float64)
            first = [slice(None)] * nd
            first[a] = 0
            last = [slice(None)] * nd
            last[a] = -1
            cf = [slice(None)] * nd
            cf[a] = 0
            cl = [slice(None)] * nd
            cl[a] = -1
            ap[a][tuple(first)] *= fluid[tuple(cf)].astype(np.float64)
            ap[a][tuple(last)] *= fluid[tuple(cl)].astype(np.float64)
        open_any = np.zeros(grid.shape, bool)
        for a in range(nd):
            open_any |= (ap[a][lo_sl(a)] > 0) | (ap[a][hi_sl(a)] > 0)
        new_fluid = fluid & open_any
        if (new_fluid == fluid).all():
            break
        fluid = new_fluid
    return tuple(ap), fluid, ~fluid
