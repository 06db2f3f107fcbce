"""Aerodynamic force diagnostics: control-volume momentum balance.

Capability beyond the bare reference solver (SURVEY.md records none), but a
standard output of any cylinder benchmark: drag/lift coefficients. On a
Cartesian MAC grid with a stair-step obstacle mask, integrating the stress
directly over the masked surface is noisy at O(h); the control-volume (CV)
momentum balance is the robust classical alternative:

    F_body = - d/dt (integral_CV rho u dV)
             - (surface integral of rho u (u . n) dA)     [momentum flux]
             - (surface integral of p n dA)               [pressure]
             + (surface integral of mu grad(u) . n dA)    [viscous]

over any box enclosing the body. All four surface terms are cheap jnp
slice reductions (device-resident, scan-friendly); the d/dt term is the
finite difference of the CV momentum between successive samples (it
time-averages to ~0 over a shedding period for the mean drag).

Conventions: 2D, unit density, the box is given in CELL indices
``(i0, i1, j0, j1)`` (exclusive upper), box faces lie on cell boundaries =
u/v face planes. Returns instantaneous (surface_force_x, surface_force_y,
cv_momentum_x, cv_momentum_y); the caller assembles
``F = d(cv_momentum)/dt + surface_force`` and
``Cd = 2 Fx / (rho U^2 D)``, ``Cl = 2 Fy / (rho U^2 D)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import GridSpec, State

Array = jax.Array


def cv_terms(
    grid: GridSpec, state: State, nu: float, box: tuple[int, int, int, int]
):
    """(surface_force_x, surface_force_y, mom_x, mom_y) for the CV ``box``.

    surface_force_* is the sum of momentum-flux + pressure + viscous
    surface integrals with OUTWARD normals, signed so that
    ``F_body = d(mom)/dt + surface_force`` (all terms already negated per
    the balance above).
    """
    if grid.ndim != 2:
        raise ValueError("cv_terms is 2D")
    i0, i1, j0, j1 = box
    dx, dy = grid.spacing
    u, v = state.u
    p = state.p

    # --- CV momentum (face velocities integrated over the box) ----------
    mom_x = jnp.sum(
        0.5 * (u[i0:i1, j0:j1] + u[i0 + 1:i1 + 1, j0:j1])
    ) * dx * dy
    mom_y = jnp.sum(
        0.5 * (v[i0:i1, j0:j1] + v[i0:i1, j0 + 1:j1 + 1])
    ) * dx * dy

    # --- x-faces (left i0, right i1): normal = -x / +x ------------------
    # u on the face plane; v interpolated to the face plane's cell rows
    def x_face(i, sgn):
        uf = u[i, j0:j1]                       # u on the face (j cells)
        # d(u)/dx one-sided INTO the box
        dudx = (u[i + 1, j0:j1] - u[i - 1, j0:j1]) / (2.0 * dx) \
            if 0 < i < grid.shape[0] else jnp.zeros_like(uf)
        # v at the face plane: average the 4 surrounding v faces
        vf = 0.25 * (v[i - 1, j0:j1] + v[i, j0:j1]
                     + v[i - 1, j0 + 1:j1 + 1] + v[i, j0 + 1:j1 + 1])
        dvdx = (v[i, j0:j1] + v[i, j0 + 1:j1 + 1]
                - v[i - 1, j0:j1] - v[i - 1, j0 + 1:j1 + 1]) / (2.0 * dx)
        pf = 0.5 * (p[i - 1, j0:j1] + p[i, j0:j1])
        # momentum flux rho u (u.n), pressure p n, viscous nu du/dn
        fx = sgn * jnp.sum(uf * uf) * dy + sgn * jnp.sum(pf) * dy \
            - sgn * nu * jnp.sum(dudx) * dy
        fy = sgn * jnp.sum(vf * uf) * dy - sgn * nu * jnp.sum(dvdx) * dy
        return fx, fy

    # --- y-faces (bottom j0, top j1): normal = -y / +y ------------------
    def y_face(j, sgn):
        vf = v[i0:i1, j]
        dvdy = (v[i0:i1, j + 1] - v[i0:i1, j - 1]) / (2.0 * dy) \
            if 0 < j < grid.shape[1] else jnp.zeros_like(vf)
        uf = 0.25 * (u[i0:i1, j - 1] + u[i0:i1, j]
                     + u[i0 + 1:i1 + 1, j - 1] + u[i0 + 1:i1 + 1, j])
        dudy = (u[i0:i1, j] + u[i0 + 1:i1 + 1, j]
                - u[i0:i1, j - 1] - u[i0 + 1:i1 + 1, j - 1]) / (2.0 * dy)
        pf = 0.5 * (p[i0:i1, j - 1] + p[i0:i1, j])
        fy = sgn * jnp.sum(vf * vf) * dx + sgn * jnp.sum(pf) * dx \
            - sgn * nu * jnp.sum(dvdy) * dx
        fx = sgn * jnp.sum(uf * vf) * dx - sgn * nu * jnp.sum(dudy) * dx
        return fx, fy

    fxl, fyl = x_face(i0, -1.0)
    fxr, fyr = x_face(i1, +1.0)
    fxb, fyb = y_face(j0, -1.0)
    fxt, fyt = y_face(j1, +1.0)
    # F_body = -d/dt(mom) - (net outward surface terms); we return the
    # NEGATED surface sum so F = -d(mom)/dt + surface_force
    sfx = -(fxl + fxr + fxb + fxt)
    sfy = -(fyl + fyr + fyb + fyt)
    return sfx, sfy, mom_x, mom_y


def cv_terms_nd(grid: GridSpec, state: State, nu: float, box):
    """Rank-generic control-volume terms: ``box`` is ``2*ndim`` cell
    indices ``(i0, i1, j0, j1[, k0, k1])`` (exclusive upper, faces on cell
    boundaries). Returns ``(surface_force, momentum)`` -- two length-ndim
    tuples of scalars with the same sign conventions as :func:`cv_terms`
    (``F_b = -d(mom_b)/dt + surface_force_b``).

    In 2D this is slice-for-slice the same discretization as the
    hand-unrolled :func:`cv_terms` (tested equal to f32 roundoff); 3D adds
    the third face pair, enabling sphere drag from the same machinery.
    """
    nd = grid.ndim
    if len(box) != 2 * nd:
        raise ValueError(f"box needs {2 * nd} indices for a {nd}D grid")
    lo = tuple(box[2 * a] for a in range(nd))
    hi = tuple(box[2 * a + 1] for a in range(nd))
    h = grid.spacing
    cell_vol = 1.0
    for s in h:
        cell_vol *= s
    interior = tuple(slice(lo[a], hi[a]) for a in range(nd))

    # --- CV momentum: face-avg of each component over the box ------------
    mom = []
    for b in range(nd):
        ub = state.u[b]
        lo_f = list(interior)
        hi_f = list(interior)
        lo_f[b] = slice(lo[b], hi[b])
        hi_f[b] = slice(lo[b] + 1, hi[b] + 1)
        mom.append(
            jnp.sum(0.5 * (ub[tuple(lo_f)] + ub[tuple(hi_f)])) * cell_vol
        )

    # --- surface terms over the 2*nd box faces ---------------------------
    sf = [jnp.zeros((), grid.dtype) for _ in range(nd)]

    def clamp_cell(i: int, a: int) -> int:
        """Clamp a cell-centered index along axis a into the domain. Box
        faces that sit ON a domain boundary read their i-1 neighbors
        one-sided (the clamped duplicate) instead of wrapping to the far
        side of the array via Python's negative indexing."""
        return min(max(i, 0), grid.shape[a] - 1)

    def tangential_on_face(b: int, a: int, i: int):
        """Component b (staggered along axis b) averaged onto the plane of
        the face normal to axis a at index i, restricted to the box's
        cells in the other axes: the 4-point average of the surrounding
        b-faces (2 in axis a x 2 in axis b); one-sided 2-point at domain
        boundaries."""
        ub = state.u[b]
        cells = [slice(lo[c], hi[c]) for c in range(nd)]
        vals = 0.0
        for da in (clamp_cell(i - 1, a), clamp_cell(i, a)):
            for off in (0, 1):
                s = list(cells)
                s[a] = da
                s[b] = slice(lo[b] + off, hi[b] + off)
                vals = vals + ub[tuple(s)]
        return 0.25 * vals

    for a in range(nd):
        da = h[a]
        face_area = cell_vol / da
        ua = state.u[a]
        for i, sgn in ((lo[a], -1.0), (hi[a], +1.0)):
            cells = [slice(lo[c], hi[c]) for c in range(nd)]
            # u_a exactly on the face plane
            uf = ua[tuple(s if c != a else i for c, s in enumerate(cells))]
            # one-sided-into-box du_a/dx_a (central over the two
            # neighboring face planes; zero at domain boundaries)
            if 0 < i < grid.shape[a]:
                up = ua[tuple(s if c != a else i + 1
                              for c, s in enumerate(cells))]
                um = ua[tuple(s if c != a else i - 1
                              for c, s in enumerate(cells))]
                dua = (up - um) / (2.0 * da)
            else:
                dua = jnp.zeros_like(uf)
            # cell-avg pressure on the face plane (one-sided at domain
            # boundaries: both reads clamp to the same interior cell)
            pm = state.p[tuple(s if c != a else clamp_cell(i - 1, a)
                               for c, s in enumerate(cells))]
            pp = state.p[tuple(s if c != a else clamp_cell(i, a)
                               for c, s in enumerate(cells))]
            pf = 0.5 * (pm + pp)
            # normal-momentum terms: flux + pressure + viscous
            sf[a] = sf[a] + sgn * (jnp.sum(uf * uf) + jnp.sum(pf)) \
                * face_area - sgn * nu * jnp.sum(dua) * face_area
            # tangential components: flux u_b (u_a . n) + viscous du_b/dx_a
            for b in range(nd):
                if b == a:
                    continue
                vb = tangential_on_face(b, a, i)
                ubc = state.u[b]
                cells_b = [slice(lo[c], hi[c]) for c in range(nd)]
                # du_b/dx_a across the face: difference of the two
                # b-face-pair sums adjacent to the plane (matches the 2D
                # hand-rolled stencil exactly)
                def pair_sum(ia):
                    s0 = list(cells_b)
                    s0[a] = clamp_cell(ia, a)
                    s1 = list(s0)
                    s0[b] = slice(lo[b], hi[b])
                    s1[b] = slice(lo[b] + 1, hi[b] + 1)
                    return ubc[tuple(s0)] + ubc[tuple(s1)]

                # clamping makes this zero on a domain-boundary face,
                # matching the dua guard above
                dvb = (pair_sum(i) - pair_sum(i - 1)) / (2.0 * da)
                sf[b] = sf[b] + sgn * jnp.sum(vb * uf) * face_area \
                    - sgn * nu * jnp.sum(dvb) * face_area

    return tuple(-s for s in sf), tuple(mom)


def drag_lift_series(
    grid: GridSpec, nu: float, box, sf_x, sf_y, mom_x, mom_y, dt_sample,
    u_inf: float = 1.0, diameter: float = 1.0, rho: float = 1.0,
):
    """Assemble Cd/Cl time series from sampled CV terms (numpy/jnp arrays
    over time): F = -d(mom)/dt + surface_force, central-differenced."""
    import numpy as np

    sf_x = np.asarray(sf_x)
    sf_y = np.asarray(sf_y)
    mom_x = np.asarray(mom_x)
    mom_y = np.asarray(mom_y)
    dmx = np.gradient(mom_x, dt_sample)
    dmy = np.gradient(mom_y, dt_sample)
    fx = -dmx + sf_x
    fy = -dmy + sf_y
    scale = 2.0 / (rho * u_inf * u_inf * diameter)
    return fx * scale, fy * scale


def dominant_frequency(series, dt_sample: float) -> float:
    """Dominant oscillation frequency of a (demeaned, Hann-windowed) time
    series via the rFFT peak -- e.g. the lift-coefficient series from
    ``run_scan_forces`` gives the shedding frequency directly, so
    St = dominant_frequency(cl, dt) * D / U without any velocity probe."""
    import numpy as np

    x = np.asarray(series, dtype=np.float64)
    x = x - x.mean()
    if len(x) < 8 or not np.any(x):
        return 0.0
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    spec[0] = 0.0
    k = int(np.argmax(spec))
    # quadratic interpolation around the peak bin for sub-bin resolution
    if 1 <= k < len(spec) - 1:
        a, b, c = spec[k - 1], spec[k], spec[k + 1]
        denom = a - 2 * b + c
        if denom != 0.0:
            k = k + 0.5 * (a - c) / denom
    return float(k / (len(x) * dt_sample))
