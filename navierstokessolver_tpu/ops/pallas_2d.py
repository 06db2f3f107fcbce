"""Fused 2D whole-step Pallas kernels (VERDICT r1 item 9, redesigned).

Round 1 measured the per-COMPONENT 2D predictor kernel at parity with
XLA's fusion and sidelined it. What is NOT at parity is the whole
non-Poisson step: at 2048x1024 the jnp predictor + BC pass + divergence +
correction + diagnostics cost 0.91 ms/step (measured via a zero-cycle
run) against a ~0.3 ms speed-of-light. This module is the 2D port of the
3D v3 design -- TWO kernels per step over an internal row-padded layout
carried through the scan:

  kernel A (`predictor_rhs_2d_internal`): u*, v* with BCs applied
      in-register and obstacle faces zeroed, plus the scaled Poisson RHS;
  kernel B (`correct_diag_2d_internal`): pressure correction with
      per-face gating, BC-face preservation, and the step diagnostics
      (max |div u| over fluid cells, max |u_a|/h_a) as per-stripe partials.

2D-specific upgrades over the 3D kernels (the cylinder config needs both):
  * OBSTACLE masks: one uint8 code per staggered face (bit 0: face open,
    bit 1: correction applied), streamed at 1 byte/face; the fluid mask
    for the RHS/diagnostics rides the uint8 Poisson stencil code already
    built by ops/poisson.py (bit 6).
  * Axis-0 OUTFLOW faces: the zero-gradient copy u[n0] = u[n0-1] crosses
    a stripe boundary, so every stripe computes ONE extra row below its
    output block (overlap-recompute) -- at the 2D tile (T >= 64 rows of a
    single plane) that costs ~1/T of the VPU work.

Layout: row r <-> global row r (axis 0), lanes = axis 1, padded to
L = round_up(n1, 128). u is (n0+1, n1) faces; v's duplicate boundary face
(lane n1) is ELIDED (reconstructed from its BC spec at every reader), so
u, v, p, rhs all carry exactly L lanes and the scan state never pays
lane-dim padding. Rows pad to RP = (G+1)T with a zero-filled margin
stripe; pad rows are kept identically zero (the corrector masks them) so
the carried state cannot accumulate garbage.

Validated against the jnp step in interpret mode (tests/test_pallas2d.py);
the jnp path remains the permanent reference semantics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bcs import BCKind, BCTable
from ..grid import GridSpec
from .pallas_kernels import _round_up, _scalar_bc

Array = jax.Array

FACE_OPEN = 1       # face not blocked by a solid cell
CORR_OK = 2         # pressure-gradient correction applied on this face
FLUID_BIT = 6       # in ops/poisson.py's stencil code


def _tangential_ghost_2d(bcs: BCTable, c: int, ax: int, side: int):
    """(alpha, beta): ghost = alpha*edge + beta for component c across
    transverse axis ax (wall/inflow reflection; slip/outflow copy)."""
    bc = bcs[(ax, side)]
    if bc.kind in (BCKind.WALL, BCKind.INFLOW):
        return -1.0, 2.0 * _scalar_bc(bcs, (ax, side), c, 2)
    return 1.0, 0.0


def _own_face_2d(bcs: BCTable, a: int, side: int):
    bc = bcs[(a, side)]
    if bc.kind is BCKind.OUTFLOW:
        return ("copy",)
    if bc.kind is BCKind.PERIODIC:
        return ("wrap",)
    if bc.kind is BCKind.CONVECTIVE:
        speed = float(bc.velocity[0]) if bc.velocity else 1.0
        return ("conv", speed)
    return ("d", _scalar_bc(bcs, (a, side), a, 2))


def fused_step2d_applicable(grid: GridSpec, bcs: BCTable) -> bool:
    if grid.ndim != 2 or grid.dtype != jnp.float32:
        return False
    # Periodic axes ARE supported: lanes (axis 1) wrap in-register
    # (_lane_wrap: a plain roll when L == n1), rows (axis 0) read the lo
    # wrap ghost from a 1-row scratch DMA'd off the refreshed row RP-1 and
    # the hi ghost from the refreshed data row n0; the u duplicate face and
    # its rhs plane are patched post-kernel.
    if _tile_2d(grid) < 32:
        return False   # masked-code DMA needs 32-row-aligned stripes
    for a in range(2):
        for s in (0, 1):
            bc = bcs[(a, s)]
            if bc.kind is BCKind.CONVECTIVE:
                # supported ONLY on the axis-0 HI face (the cylinder/
                # sphere outlet topology): both the once-per-step
                # convective transport update (from the carried old face
                # + the in-register inner star) and the Dirichlet-ghost
                # pressure correction happen in-kernel
                if (a, s) != (0, 1):
                    return False
            if bc.kind in (BCKind.WALL, BCKind.INFLOW):
                for c in range(2):
                    if _scalar_bc(bcs, (a, s), c, 2) is None:
                        return False
    return True


def _tile_2d(grid: GridSpec, tile: int = 128) -> int:
    return math.gcd(tile, grid.shape[0])


def _dims_2d(grid: GridSpec, tile: int = 128):
    n0, n1 = grid.shape
    T = _tile_2d(grid, tile)
    G = n0 // T + 1                # data stripes cover u rows [0, n0]
    RP = (G + 1) * T
    L = _round_up(n1, 128)
    return T, G, RP, L


# ---------------------------------------------------------------------------
# Layout conversion + static planes
# ---------------------------------------------------------------------------


def to_internal_2d(grid: GridSpec, u, tile: int = 128):
    T, G, RP, L = _dims_2d(grid, tile)
    n0, n1 = grid.shape
    uu = jnp.pad(u[0], [(0, RP - (n0 + 1)), (0, L - n1)])
    vv = jnp.pad(u[1][:, :n1], [(0, RP - n0), (0, L - n1)])
    return uu, vv


def from_internal_2d(grid: GridSpec, bcs: BCTable, iu):
    n0, n1 = grid.shape
    uu = iu[0][: n0 + 1, :n1]
    vv = iu[1][:n0, :n1]
    spec = _own_face_2d(bcs, 1, 1)
    if spec[0] == "copy":
        face = vv[:, n1 - 1:n1]
    elif spec[0] == "wrap":
        face = vv[:, 0:1]            # periodic duplicate face n1 == face 0
    else:
        face = jnp.full((n0, 1), spec[1], vv.dtype)
    return uu, jnp.concatenate([vv, face], axis=1)


def build_face_codes(grid: GridSpec, face_masks, corr_masks,
                     tile: int = 128):
    """(code_u, code_v) uint8 planes in the internal layout, or None when
    there are no obstacles (the unmasked kernel variant skips the reads)."""
    if face_masks is None and corr_masks is None:
        return None
    T, G, RP, L = _dims_2d(grid, tile)
    n0, n1 = grid.shape

    def pack(fm, cm, rows, axis):
        open_ = (np.ones((rows, n1), bool) if fm is None
                 else np.asarray(fm[:rows, :n1], bool))
        # corr_masks cover INTERIOR faces only (bcs.correction_face_masks:
        # comp a has shape grid.shape - e_a); boundary faces are never
        # corrected (also enforced by the kernel's BC preservation)
        corr = np.zeros((rows, n1), bool)
        if axis == 0:
            corr[1:n0, :] = (True if cm is None
                             else np.asarray(cm, bool))
        else:
            corr[:, 1:n1] = (True if cm is None
                             else np.asarray(cm[:, : n1 - 1], bool))
        code = (open_.astype(np.uint8) * FACE_OPEN
                | corr.astype(np.uint8) * CORR_OK)
        out = np.zeros((RP, L), np.uint8)
        out[:rows, :n1] = code
        return jnp.asarray(out)

    fu = None if face_masks is None else np.asarray(face_masks[0])
    fv = None if face_masks is None else np.asarray(face_masks[1])
    cu = None if corr_masks is None else np.asarray(corr_masks[0])
    cv = None if corr_masks is None else np.asarray(corr_masks[1])
    return pack(fu, cu, n0 + 1, 0), pack(fv, cv, n0, 1)


def pad_fluid_code(grid: GridSpec, code: Array, tile: int = 128) -> Array:
    """ops/poisson stencil code (uint8, cells) -> internal layout."""
    T, G, RP, L = _dims_2d(grid, tile)
    n0, n1 = grid.shape
    return jnp.pad(code, [(0, RP - n0), (0, L - n1)])


def pad_theta_2d(grid: GridSpec, theta: Array, tile: int = 128) -> Array:
    """Cell-centered scalar -> internal layout (axis-0 ghost rows n0 /
    RP-1 are refreshed per step by the corrector wrapper)."""
    T, G, RP, L = _dims_2d(grid, tile)
    n0, n1 = grid.shape
    return jnp.pad(theta, [(0, RP - n0), (0, L - n1)])


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_shift(x, sh: int, fix):
    """Neighbor at lane j+sh via roll; fix=(edge_idx, alpha, beta) replaces
    the wrapped edge lane with alpha*x + beta (None: leave wrap garbage --
    it only reaches discarded or BC-overwritten outputs)."""
    r = jnp.roll(x, -sh, axis=1)
    if fix is None:
        return r
    edge, alpha, beta = fix
    return jnp.where(_lane_iota(x.shape) == edge, alpha * x + beta, r)


def _lane_wrap(x, sh: int, n: int):
    """Periodic lane neighbor at (j+sh) mod ``n`` (valid lane extent n;
    tile padding beyond). Plain roll when L == n (production shapes);
    otherwise the vacated edge lane is patched via a second roll."""
    r = jnp.roll(x, -sh, axis=1)
    if x.shape[1] == n:
        return r
    assert sh in (-1, 1), sh
    if sh == 1:
        return jnp.where(
            _lane_iota(x.shape) == n - 1, jnp.roll(x, n - 1, axis=1), r
        )
    return jnp.where(
        _lane_iota(x.shape) == 0, jnp.roll(x, 1 - n, axis=1), r
    )


# ---------------------------------------------------------------------------
# Kernel A: predictor + BCs + masks + Poisson RHS
# ---------------------------------------------------------------------------


def _pred2d_kernel(
    sc_ref, u_hbm, v_hbm, *rest,
    T: int, n: tuple, h: tuple, nu: float, gamma: float,
    tg: dict, own: dict, RP: int, masked: bool,
    per: tuple = (False, False), force: tuple = (0.0, 0.0),
    buoy: tuple = (0.0, 0.0), tref: float = 0.0, thermal: bool = False,
    based: bool = False,
):
    # canonical optional-operand/scratch order: thermal, based, masked,
    # then the per[0] lo-ghost scratches (matches the wrapper)
    it = iter(rest)
    if thermal:
        th_hbm = next(it)
    if based:
        bu_hbm, bv_hbm = next(it), next(it)
    if masked:
        cu_hbm, cv_hbm, fc_hbm = next(it), next(it), next(it)
    uo, vo, rhs_ref, us, vs = (next(it) for _ in range(5))
    if thermal:
        ths = next(it)
    if based:
        bus, bvs = next(it), next(it)
    sems = next(it)
    if masked:
        cu_s, cv_s, fc_s, csems = (next(it) for _ in range(4))
    if per[0]:
        # periodic rows: +2 one-row lo-ghost scratches (global row n0-1,
        # DMA'd off the wrapper-refreshed input row RP-1 at stripe 0)
        ug, vg, gsems = next(it), next(it), next(it)
    i = pl.program_id(0)
    n0, n1 = n
    hx, hy = h
    G = n0 // T + 1
    # Window = rows [iT-8, iT+T+8) (clamped at 0): Mosaic requires the DMA
    # slice height on the sublane dim of a rank-2 array to be 8-aligned, so
    # the halo rows are over-fetched to the alignment boundary. The body
    # only ever reads [iT-2, iT+T+2).
    R4 = T + 16
    phase = jax.lax.rem(i, 2)

    def _dma(st, stc, ph):
        # st must be an AFFINE 8-divisible expression of the grid index --
        # Mosaic's tiling-divisibility analysis cannot prove through
        # max/clip. The prologue passes the constant 0 (stripe 0's clamped
        # window); the prefetch passes (i+1)*T - 8, which is never negative
        # for i >= 0. Only data stripes are fetched, so windows stay in
        # bounds.
        pairs = [(u_hbm, us), (v_hbm, vs)]
        if thermal:
            pairs.append((th_hbm, ths))   # theta rides the same windows
        if based:
            pairs += [(bu_hbm, bus), (bv_hbm, bvs)]   # rk2 base state
        cps = [
            pltpu.make_async_copy(
                ref.at[pl.ds(st, R4)], scr.at[ph],
                sems.at[ph, k],
            )
            for k, (ref, scr) in enumerate(pairs)
        ]
        if masked:
            # code windows [jT, jT+2T): covers output rows + the extra top
            # row; starts are T-aligned (T % 32 == 0 gates DMA alignment)
            cps += [
                pltpu.make_async_copy(
                    ref.at[pl.ds(stc, 2 * T)], scr.at[ph],
                    csems.at[ph, k],
                )
                for k, (ref, scr) in enumerate(
                    ((cu_hbm, cu_s), (cv_hbm, cv_s), (fc_hbm, fc_s))
                )
            ]
        return cps

    @pl.when(i == 0)
    def _prologue():
        for cp in _dma(0, 0, 0):
            cp.start()

    @pl.when(i + 1 < G)
    def _prefetch():
        # i*T + const keeps the start provably 8-divisible for Mosaic
        # (an (i+1)*T - 8 chain defeats its divisibility analysis)
        for cp in _dma(i * T + (T - 8), i * T + T, 1 - phase):
            cp.start()

    if per[0]:
        gcopies = [
            pltpu.make_async_copy(
                ref.at[pl.ds(RP - 8, 8)], scr, gsems.at[k]
            )
            for k, (ref, scr) in enumerate(((u_hbm, ug), (v_hbm, vg)))
        ]

        @pl.when(i == 0)
        def _lo_ghost_dma():
            for cp in gcopies:
                cp.start()
            for cp in gcopies:
                cp.wait()

    @pl.when(i < G)
    def _wait():
        for cp in _dma(0, 0, phase):   # starts irrelevant for wait
            cp.wait()
    dt = sc_ref[0]
    rho_over_dt = sc_ref[1]

    spec_v_lo = own[(1, 0)]
    spec_v_hi = own[(1, 1)]

    def v_hi_fix():
        if spec_v_hi[0] == "copy":
            return (n1 - 1, 1.0, 0.0)
        return (n1 - 1, 0.0, spec_v_hi[1])

    def lane_hi(x):
        """v-face hi neighbor across lanes: wrap (periodic) or the
        elided-face ghost fix."""
        return (_lane_wrap(x, +1, n1) if per[1]
                else _lane_shift(x, +1, v_hi_fix()))

    def body(ro: int, lo_extra: int):
        """Window row (off + w) <-> global row (i*T + w - ro). Stars are
        computed for global u rows [iT - lo_extra, iT + T + 1) and v rows
        [iT - lo_extra, iT + T)."""
        uw = us[phase]
        vw = vs[phase]
        rows_u = T + 1 + lo_extra
        rows_v = T + lo_extra
        bu = ro - lo_extra

        def nbr(w, d, rows, a):
            s = bu + d
            if s < 0:
                # stripe 0 reaching global row -1: roll + tangential ghost
                r = jnp.roll(w, 1, axis=0)[0:rows]
                ri = _row_iota(r.shape)
                if per[0]:
                    # true wrap row n0-1 from the lo-ghost scratch (last
                    # row of the 8-aligned fetch off input row RP-1)
                    g_scr = (ug, vg)[a]
                    return jnp.where(ri == 0, g_scr[7:8], r)
                if a == 0:
                    return r      # only feeds face 0 (BC-overwritten)
                al, bl = tg[(1, 0, 0)]
                c = w[0:rows]
                return jnp.where(ri == 0, al * c + bl, r)
            r = w[s:s + rows]
            if a == 1 and d > 0 and not per[0]:
                # v's axis-0 hi tangential ghost: reads of (pad) row n0
                # become ah * v[n0-1] + bh, with v[n0-1] = the center slice
                # (periodic rows: data row n0 is the refreshed wrap ghost)
                ah, bh = tg[(1, 0, 1)]
                c = w[s - 1:s - 1 + rows]
                gi = _row_iota(r.shape) + i * T - lo_extra + d
                return jnp.where(gi == n0, ah * c + bh, r)
            return r

        # ---- u stars ---------------------------------------------------
        uc = uw[bu:bu + rows_u]
        u_e = nbr(uw, +1, rows_u, 0)
        u_w = nbr(uw, -1, rows_u, 0)
        if per[1]:
            u_n = _lane_wrap(uc, +1, n1)
            u_s = _lane_wrap(uc, -1, n1)
        else:
            alu, blu = tg[(0, 1, 0)]
            ahu, bhu = tg[(0, 1, 1)]
            u_n = _lane_shift(uc, +1, (n1 - 1, ahu, bhu))
            u_s = _lane_shift(uc, -1, (0, alu, blu))
        v_r = nbr(vw, 0, rows_u, 1)
        v_rm = nbr(vw, -1, rows_u, 1)
        vbar = 0.25 * (v_r + v_rm + lane_hi(v_r) + lane_hi(v_rm))
        d0c = (u_e - u_w) * (1.0 / (2 * hx))
        d1c = (u_n - u_s) * (1.0 / (2 * hy))
        if gamma > 0.0:
            d0u = jnp.where(uc > 0, (uc - u_w) * (1.0 / hx),
                            (u_e - uc) * (1.0 / hx))
            d1u = jnp.where(vbar > 0, (uc - u_s) * (1.0 / hy),
                            (u_n - uc) * (1.0 / hy))
            d0 = gamma * d0u + (1 - gamma) * d0c
            d1 = gamma * d1u + (1 - gamma) * d1c
        else:
            d0, d1 = d0c, d1c
        lap = (u_e - 2 * uc + u_w) * (1.0 / (hx * hx)) + \
              (u_n - 2 * uc + u_s) * (1.0 / (hy * hy))
        rhs_u = nu * lap - (uc * d0 + vbar * d1)
        if force[0]:
            rhs_u = rhs_u + force[0]
        if thermal and buoy[0]:
            # Boussinesq buoyancy at u faces: theta cells k-1, k averaged
            # (stripe-0 face 0 reads roll garbage -- BC-overwritten below;
            # buoyancy along a periodic axis is rejected at build)
            thw = ths[phase]
            th_c = thw[bu:bu + rows_u]
            th_m = (jnp.roll(thw, 1, axis=0)[0:rows_u] if bu == 0
                    else thw[bu - 1:bu - 1 + rows_u])
            rhs_u = rhs_u + buoy[0] * (0.5 * (th_m + th_c) - tref)
        if based:
            # rk2 stage 2: u* = u_base + dt*RHS(u_mid)
            u_star = bus[phase][bu:bu + rows_u] + dt * rhs_u
        else:
            u_star = uc + dt * rhs_u

        # ---- v stars ---------------------------------------------------
        vc = vw[bu:bu + rows_v]
        v_e = nbr(vw, +1, rows_v, 1)
        v_w = nbr(vw, -1, rows_v, 1)
        v_n = lane_hi(vc)
        # face -1: wrap (periodic) or garbage feeding the BC-written face 0
        v_s = (_lane_wrap(vc, -1, n1) if per[1]
               else _lane_shift(vc, -1, None))
        u_r = nbr(uw, 0, rows_v, 0)
        u_rp = nbr(uw, +1, rows_v, 0)
        if per[1]:
            ubar = 0.25 * (u_r + u_rp + _lane_wrap(u_r, -1, n1)
                           + _lane_wrap(u_rp, -1, n1))
        else:
            ubar = 0.25 * (u_r + u_rp + _lane_shift(u_r, -1, None)
                           + _lane_shift(u_rp, -1, None))
        e0c = (v_e - v_w) * (1.0 / (2 * hx))
        e1c = (v_n - v_s) * (1.0 / (2 * hy))
        if gamma > 0.0:
            e0u = jnp.where(ubar > 0, (vc - v_w) * (1.0 / hx),
                            (v_e - vc) * (1.0 / hx))
            e1u = jnp.where(vc > 0, (vc - v_s) * (1.0 / hy),
                            (v_n - vc) * (1.0 / hy))
            e0 = gamma * e0u + (1 - gamma) * e0c
            e1 = gamma * e1u + (1 - gamma) * e1c
        else:
            e0, e1 = e0c, e1c
        lav = (v_e - 2 * vc + v_w) * (1.0 / (hx * hx)) + \
              (v_n - 2 * vc + v_s) * (1.0 / (hy * hy))
        rhs_v = nu * lav - (ubar * e0 + vc * e1)
        if force[1]:
            rhs_v = rhs_v + force[1]
        if thermal and buoy[1]:
            thw = ths[phase]
            th_cv = thw[bu:bu + rows_v]
            th_mv = _lane_shift(th_cv, -1, None)   # face-0 garbage: BC'd
            rhs_v = rhs_v + buoy[1] * (0.5 * (th_mv + th_cv) - tref)
        if based:
            v_star = bvs[phase][bu:bu + rows_v] + dt * rhs_v
        else:
            v_star = vc + dt * rhs_v

        # ---- in-register BCs -------------------------------------------
        # (periodic own axis: face 0 is computed from wrap reads; u's
        # duplicate face n0 is patched post-kernel, v's is lane-elided)
        if not per[0]:
            gi = _row_iota(u_star.shape) + i * T - lo_extra
            lo_u, hi_u = own[(0, 0)], own[(0, 1)]
            vle = (jnp.roll(u_star, -1, axis=0) if lo_u[0] == "copy"
                   else jnp.full_like(u_star, lo_u[1]))
            if hi_u[0] == "copy":
                vhe = jnp.roll(u_star, 1, axis=0)
            elif hi_u[0] == "conv":
                # convective outlet: u_b^{n+1} = u_b^n - C (u_b^n -
                # u*_inner), C = U dt / h clamped to [0, 1]; u_b^n is the
                # carried old face (the input center), u*_inner the
                # in-register star at row n0-1
                cclip = jnp.clip(
                    hi_u[1] * dt * (1.0 / hx), 0.0, 1.0
                )
                vhe = uc - cclip * (uc - jnp.roll(u_star, 1, axis=0))
            else:
                vhe = jnp.full_like(u_star, hi_u[1])
            u_star = jnp.where(
                gi == 0, vle, jnp.where(gi == n0, vhe, u_star)
            )
        if not per[1]:
            lv = _lane_iota(v_star.shape)
            v_lo_val = (_lane_shift(v_star, +1, None)
                        if spec_v_lo[0] == "copy"
                        else jnp.full_like(v_star, spec_v_lo[1]))
            v_star = jnp.where(lv == 0, v_lo_val, v_star)

        # ---- obstacle face masks + outputs + divergence ---------------
        if masked:
            cu = cu_s[phase]    # code row w <-> global iT + w
            cv = cv_s[phase]
            u_keep = u_star[lo_extra:]
            v_keep = v_star[lo_extra:]
            u_keep = jnp.where(
                (cu[0:T + 1] & FACE_OPEN) != 0, u_keep, 0.0
            )
            v_keep = jnp.where((cv[0:T] & FACE_OPEN) != 0, v_keep, 0.0)
        else:
            u_keep = u_star[lo_extra:]
            v_keep = v_star[lo_extra:]
        uo[...] = u_keep[:T]
        vo[...] = v_keep[:T]
        dd = (u_keep[1:T + 1] - u_keep[:T]) * (1.0 / hx) + \
             (lane_hi(v_keep[:T]) - v_keep[:T]) * (1.0 / hy)
        rhs = dd * rho_over_dt
        if masked:
            fc = fc_s[phase][0:T]
            rhs = jnp.where((fc & (1 << FLUID_BIT)) != 0, rhs, 0.0)
        rhs_ref[...] = rhs

    @pl.when(i == 0)
    def _s0():
        body(0, 0)

    @pl.when(jnp.logical_and(i > 0, i < G))
    def _interior():
        body(8, 1)

    @pl.when(i == G)
    def _margin():
        uo[...] = jnp.zeros(uo.shape, uo.dtype)
        vo[...] = jnp.zeros(vo.shape, vo.dtype)
        rhs_ref[...] = jnp.zeros(rhs_ref.shape, rhs_ref.dtype)


def predictor_rhs_2d_internal(
    grid: GridSpec,
    bcs: BCTable,
    iu,
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    rho: float = 1.0,
    face_codes=None,
    fluid_code=None,
    tile: int = 128,
    interpret: bool = False,
    forcing=None,
    theta=None,
    buoyancy=None,
    theta_ref: float = 0.0,
    base=None,
):
    """Fused u*, v* + rhs over internal-layout inputs. ``face_codes`` /
    ``fluid_code`` enable the masked (obstacle) variant. ``forcing``:
    optional per-component STATIC scalar body force. ``theta`` +
    ``buoyancy`` fuse the Boussinesq forcing (theta in the internal
    layout, streamed with the u/v windows). ``base``: rk2 stage-2 mode
    (``iu`` is the midpoint field; u* = base + dt*RHS(iu))."""
    from ..bcs import periodic_axes

    n0, n1 = grid.shape
    h = tuple(float(x) for x in grid.spacing)
    T, G, RP, L = _dims_2d(grid, tile)
    masked = face_codes is not None
    per = tuple(periodic_axes(grid, bcs))
    assert not (masked and any(per)), "obstacles + periodic not supported"
    buoy = (0.0, 0.0)
    if buoyancy is not None:
        buoy = tuple(float(bb) for bb in buoyancy)
    thermal = theta is not None and any(buoy)
    based = base is not None
    assert not (masked and thermal), "obstacles + thermal not fused"

    if per[0]:
        # refresh the axis-0 wrap ghost rows in the carried input layout:
        # v's hi ghost row n0 := row 0 (u's row n0 is the carried duplicate
        # face), lo ghost row RP-1 := row n0-1 for both.
        upd = jax.lax.dynamic_update_slice_in_dim
        iu0, iu1 = iu
        iu1 = upd(iu1, iu1[0:1], n0, axis=0)
        iu0 = upd(iu0, iu0[n0 - 1:n0], RP - 1, axis=0)
        iu1 = upd(iu1, iu1[n0 - 1:n0], RP - 1, axis=0)
        iu = (iu0, iu1)

    tg = {}
    for c in range(2):
        for ax in range(2):
            if ax == c:
                continue
            for side in (0, 1):
                tg[(c, ax, side)] = _tangential_ghost_2d(bcs, c, ax, side)
    own = {(a, s): _own_face_2d(bcs, a, s) for a in range(2) for s in (0, 1)}
    sc = jnp.stack([
        jnp.asarray(dt, jnp.float32),
        jnp.asarray(rho, jnp.float32) / jnp.asarray(dt, jnp.float32),
    ])
    rho_over_dt = sc[1]
    force = (0.0, 0.0)
    if forcing is not None:
        force = tuple(0.0 if f is None else float(f) for f in forcing)
    kern = functools.partial(
        _pred2d_kernel, T=T, n=(n0, n1), h=h, nu=nu, gamma=upwind_gamma,
        tg=tg, own=own, RP=RP, masked=masked, per=per, force=force,
        buoy=buoy, tref=float(theta_ref), thermal=thermal, based=based,
    )
    n_any = 2 + (3 if masked else 0) + (1 if thermal else 0) \
        + (2 if based else 0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * n_any
    n_win = 2 + (1 if thermal else 0) + (2 if based else 0)
    scratch = [
        pltpu.VMEM((2, T + 16, L), jnp.float32) for _ in range(n_win)
    ]
    scratch.append(pltpu.SemaphoreType.DMA((2, n_win)))
    if masked:
        scratch += [
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
    if per[0]:
        scratch += [
            pltpu.VMEM((8, L), jnp.float32),
            pltpu.VMEM((8, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    args = (sc, iu[0], iu[1])
    if thermal:
        args += (theta,)
    if based:
        args += (base[0], base[1])
    if masked:
        args += (face_codes[0], face_codes[1], fluid_code)
    uo, vo, rhs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((RP, L), jnp.float32),
            jax.ShapeDtypeStruct((RP, L), jnp.float32),
            jax.ShapeDtypeStruct((RP, L), jnp.float32),
        ],
        grid=(G + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    rhs = rhs[:n0, :n1]
    if per[0]:
        # u's duplicate face n0 := face 0 (cross-stripe wrap) and the rhs
        # plane it feeds (cell n0-1): one row of work per step.
        row = uo[0:1]
        uo = jax.lax.dynamic_update_slice_in_dim(uo, row, n0, axis=0)
        du = (row[0, :n1] - uo[n0 - 1, :n1]) * (1.0 / h[0])
        vrow = vo[n0 - 1, :n1]
        if per[1]:
            vhi = jnp.roll(vrow, -1)
        else:
            spec = _own_face_2d(bcs, 1, 1)
            if spec[0] == "copy":
                vhi = jnp.concatenate([vrow[1:], vrow[n1 - 1:]], axis=0)
            else:
                vhi = jnp.concatenate(
                    [vrow[1:], jnp.full((1,), spec[1], vrow.dtype)], axis=0
                )
        dv = (vhi - vrow) * (1.0 / h[1])
        rhs = rhs.at[n0 - 1].set((du + dv) * rho_over_dt)
    return (uo, vo), rhs


# ---------------------------------------------------------------------------
# Kernel B: correction + BC preservation + diagnostics
# ---------------------------------------------------------------------------


def _corr2d_kernel(
    sc_ref, u_hbm, v_hbm, p_hbm, *rest,
    T: int, n: tuple, h: tuple, own: dict, RP: int, masked: bool,
    per: tuple = (False, False),
    thermal: bool = False, alpha: float = 0.0, tgamma: float = 0.0,
    thg: dict = None,
):
    if masked:
        cu_hbm, cv_hbm, fc_hbm, uo, vo, divmax_ref, velmax_ref, \
            us, vs, ps, sems, cu_s, cv_s, fc_s, csems = rest
    elif thermal:
        th_hbm, uo, vo, th_out, divmax_ref, velmax_ref, \
            us, vs, ps, ths, sems, th_g, tgsem = rest
    else:
        uo, vo, divmax_ref, velmax_ref, us, vs, ps, sems = rest
    j = pl.program_id(0)
    n0, n1 = n
    hx, hy = h
    G = n0 // T + 1
    R4 = T + 16   # 8-aligned DMA heights; see kernel A
    phase = jax.lax.rem(j, 2)

    def _dma(st, stc, ph):
        # affine 8-divisible starts; see kernel A
        cps = [
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(st, R4)], us.at[ph], sems.at[ph, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(st, R4)], vs.at[ph], sems.at[ph, 1],
            ),
            # p is padded with ONE extra leading row by the caller
            # (p row g at p_hbm[g+1]); the same window start keeps p row g
            # at ps index (g - start + 1)
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(st, R4)], ps.at[ph], sems.at[ph, 2],
            ),
        ]
        if thermal:
            cps.append(pltpu.make_async_copy(
                th_hbm.at[pl.ds(st, R4)], ths.at[ph], sems.at[ph, 3],
            ))
        if masked:
            cps += [
                pltpu.make_async_copy(
                    ref.at[pl.ds(stc, 2 * T)], scr.at[ph],
                    csems.at[ph, kk],
                )
                for kk, (ref, scr) in enumerate(
                    ((cu_hbm, cu_s), (cv_hbm, cv_s), (fc_hbm, fc_s))
                )
            ]
        return cps

    @pl.when(j == 0)
    def _prologue():
        for cp in _dma(0, 0, 0):
            cp.start()

    @pl.when(j + 1 < G)
    def _prefetch():
        for cp in _dma(j * T + (T - 8), j * T + T, 1 - phase):
            cp.start()

    if thermal:
        # theta's global row -1 ghost (refreshed at input row RP-1): one
        # 8-row-aligned fetch, last row is the ghost
        gcp = pltpu.make_async_copy(
            th_hbm.at[pl.ds(RP - 8, 8)], th_g, tgsem
        )

        @pl.when(j == 0)
        def _theta_lo_ghost():
            gcp.start()
            gcp.wait()

    @pl.when(j < G)
    def _wait():
        for cp in _dma(0, 0, phase):   # starts irrelevant for wait
            cp.wait()
    scale = sc_ref[0]

    spec_v_lo = own[(1, 0)]
    spec_v_hi = own[(1, 1)]

    def v_hi_fix():
        if spec_v_hi[0] == "copy":
            return (n1 - 1, 1.0, 0.0)
        return (n1 - 1, 0.0, spec_v_hi[1])

    def lane_hi(x):
        return (_lane_wrap(x, +1, n1) if per[1]
                else _lane_shift(x, +1, v_hi_fix()))

    def body(ro: int, lo_extra: int):
        # window row (off+w) <-> global row jT + w - ro for u/v;
        # p window row w <-> global p row jT + w - ro - 1 + ... see DMA:
        # ps[w] = p_hbm[clip(jT-1,0)+w] = p row jT - 2 + w (+clip shift)
        uw = us[phase]
        vw = vs[phase]
        pw = ps[phase]
        rows_u = T + 1 + lo_extra
        rows_v = T + lo_extra
        bu = ro - lo_extra

        # p window alignment: the caller pads p with ONE leading row
        # (pp[g+1] = p[g], pp[0] = 0) and the p DMA uses the SAME start as
        # the u window, so p row g sits at ps index (u-index of row g) + 1:
        # the first computed u row's p row is at index bu + 1. (For stripe
        # 0, index bu+0 is the zero pad row, whose product only reaches
        # BC-preserved boundary faces.)
        def pr(d, rows):
            return pw[bu + 1 + d:bu + 1 + d + rows]

        u_sw = uw[bu:bu + rows_u]
        # grad_x p at u row r: (p[r] - p[r-1]) / hx
        gpx = (pr(0, rows_u) - pr(-1, rows_u)) * (1.0 / hx)
        u_n = u_sw - scale * gpx
        v_sw = vw[bu:bu + rows_v]
        pc = pr(0, rows_v)
        pcm = (_lane_wrap(pc, -1, n1) if per[1]
               else _lane_shift(pc, -1, None))
        gpy = (pc - pcm) * (1.0 / hy)
        v_n = v_sw - scale * gpy

        if masked:
            cu = cu_s[phase]   # code row w <-> global jT + w
            cv = cv_s[phase]
            # The lo_extra row (global jT-1) has no code row in the
            # 32-aligned window; treat it as open/corr-allowed. Its value
            # only feeds the axis-0 outflow copy source, and obstacles at
            # the outflow boundary stripe are unphysical (they would also
            # break the jnp outflow BC); documented approximation.
            open_row = jnp.full((lo_extra, cu.shape[1]),
                                FACE_OPEN | CORR_OK, jnp.uint8)
            cu_al = jnp.concatenate(
                [open_row, cu[0:rows_u - lo_extra]], axis=0
            ) if lo_extra else cu[0:rows_u]
            cv_al = jnp.concatenate(
                [open_row, cv[0:rows_v - lo_extra]], axis=0
            ) if lo_extra else cv[0:rows_v]
            u_n = jnp.where((cu_al & CORR_OK) != 0, u_n, u_sw)
            v_n = jnp.where((cv_al & CORR_OK) != 0, v_n, v_sw)

        # BC-face preservation / outflow copies (periodic: every face is
        # corrected with the wrap gradient -- the pressure window's wrap
        # pad rows make faces 0 and n0 receive the identical correction)
        if not per[0]:
            gi = _row_iota(u_n.shape) + j * T - lo_extra
            lo_u, hi_u = own[(0, 0)], own[(0, 1)]
            vle = (jnp.roll(u_n, -1, axis=0) if lo_u[0] == "copy" else u_sw)
            if hi_u[0] == "copy":
                vhe = jnp.roll(u_n, 1, axis=0)
            elif hi_u[0] == "conv":
                # convective face held through the projection, then
                # corrected with the Dirichlet-ghost gradient the Poisson
                # row assumed (-2 p_edge / h on the hi face):
                # face += 2 scale p[n0-1] / h
                vhe = u_sw + (2.0 * scale * (1.0 / hx)) \
                    * pr(-1, rows_u)
            else:
                vhe = u_sw
            u_n = jnp.where(gi == 0, vle, jnp.where(gi == n0, vhe, u_n))
        if not per[1]:
            lv = _lane_iota(v_n.shape)
            v_lo_val = (_lane_shift(v_n, +1, None)
                        if spec_v_lo[0] == "copy" else v_sw)
            v_n = jnp.where(lv == 0, v_lo_val, v_n)

        if masked:
            u_n = jnp.where((cu_al & FACE_OPEN) != 0, u_n, 0.0)
            v_n = jnp.where((cv_al & FACE_OPEN) != 0, v_n, 0.0)

        u_keep = u_n[lo_extra:]
        v_keep = v_n[lo_extra:]
        # zero pad rows/lanes so the carried state stays clean
        gk = _row_iota(u_keep.shape) + j * T
        lk = _lane_iota(u_keep.shape)
        gkv = _row_iota(v_keep.shape) + j * T
        lkv = _lane_iota(v_keep.shape)
        u_keep = jnp.where((gk <= n0) & (lk < n1), u_keep, 0.0)
        v_keep = jnp.where((gkv < n0) & (lkv < n1), v_keep, 0.0)
        uo[...] = u_keep[:T]
        vo[...] = v_keep[:T]

        if thermal:
            # conservative flux-form theta update with the corrected
            # velocities in-register (scalar.scalar_rhs semantics)
            dt_s = sc_ref[1]
            thw2 = ths[phase]
            th_c = thw2[ro:ro + T]                    # cells jT..jT+T-1
            if ro == 0:
                th_m0 = jnp.where(
                    _row_iota(th_c.shape) == 0,
                    th_g[7:8], jnp.roll(thw2[0:T], 1, axis=0),
                )
            else:
                th_m0 = thw2[ro - 1:ro - 1 + T]
            th_p0 = thw2[ro + 1:ro + 1 + T]           # cell k+1 (row n0 =
            #                                           refreshed hi ghost)

            def face_th(t_m, t_p, uf):
                tf = 0.5 * (t_m + t_p)
                if tgamma > 0.0:
                    tf = (tgamma * jnp.where(uf > 0.0, t_m, t_p)
                          + (1.0 - tgamma) * tf)
                return tf

            f_lo0 = u_keep[:T] * face_th(th_m0, th_c, u_keep[:T])
            f_hi0 = u_keep[1:T + 1] * face_th(th_c, th_p0, u_keep[1:T + 1])
            adv = (f_hi0 - f_lo0) * (1.0 / hx)
            lap_t = (th_m0 - 2.0 * th_c + th_p0) * (1.0 / (hx * hx))

            def tgfix(side, edge_idx):
                spec = thg[(1, side)]
                if spec[0] == "wrap":
                    return None
                return (edge_idx, spec[1], spec[2])

            t_m1 = (_lane_wrap(th_c, -1, n1)
                    if thg[(1, 0)][0] == "wrap"
                    else _lane_shift(th_c, -1, tgfix(0, 0)))
            t_hi1 = (_lane_wrap(th_c, +1, n1)
                     if thg[(1, 1)][0] == "wrap"
                     else _lane_shift(th_c, +1, tgfix(1, n1 - 1)))
            vk = v_keep[:T]
            F1 = vk * face_th(t_m1, th_c, vk)
            if per[1]:
                # face n1 == face 0: patched roll (plain roll reads the
                # zeroed pad lane when n1 < L)
                F1hi = _lane_wrap(F1, +1, n1)
            else:
                spv = own[(1, 1)]
                vhi_arr = (_lane_shift(vk, +1, (n1 - 1, 1.0, 0.0))
                           if spv[0] == "copy"
                           else jnp.full_like(vk, spv[1]))
                fhi_face = vhi_arr * face_th(th_c, t_hi1, vhi_arr)
                F1hi = jnp.where(
                    _lane_iota(F1.shape) == n1 - 1,
                    fhi_face, jnp.roll(F1, -1, axis=1),
                )
            adv = adv + (F1hi - F1) * (1.0 / hy)
            lap_t = lap_t + (t_m1 - 2.0 * th_c + t_hi1) \
                * (1.0 / (hy * hy))
            th_new = th_c + dt_s * (alpha * lap_t - adv)
            keep_th = ((_row_iota(th_new.shape) + j * T < n0)
                       & (_lane_iota(th_new.shape) < n1))
            th_out[...] = jnp.where(keep_th, th_new, 0.0)

        dd = (u_keep[1:T + 1] - u_keep[:T]) * (1.0 / hx) + \
             (lane_hi(v_keep[:T]) - v_keep[:T]) * (1.0 / hy)
        # iotas built AT the consumer's shape: a jnp.where over SLICED
        # iotas crashes XLA's TPU lowering (array.h limits check)
        gT = _row_iota(dd.shape) + j * T
        lT = _lane_iota(dd.shape)
        valid = (gT < n0) & (lT < n1)
        if masked:
            fc = fc_s[phase][0:T]
            valid = valid & ((fc & (1 << FLUID_BIT)) != 0)
        divm = jnp.max(jnp.where(valid, jnp.abs(dd), 0.0))
        vel = jnp.max(jnp.where(
            (gk <= n0) & (lk < n1), jnp.abs(u_keep), 0.0)) * (1.0 / hx)
        vkT = v_keep[:T]
        vel = jnp.maximum(vel, jnp.max(jnp.where(
            (_row_iota(vkT.shape) + j * T < n0)
            & (_lane_iota(vkT.shape) < n1), jnp.abs(vkT), 0.0))
            * (1.0 / hy))
        divmax_ref[...] = jnp.full(divmax_ref.shape, divm)
        velmax_ref[...] = jnp.full(velmax_ref.shape, vel)

    @pl.when(j == 0)
    def _s0():
        body(0, 0)

    @pl.when(jnp.logical_and(j > 0, j < G))
    def _interior():
        body(8, 1)

    @pl.when(j == G)
    def _margin():
        uo[...] = jnp.zeros(uo.shape, uo.dtype)
        vo[...] = jnp.zeros(vo.shape, vo.dtype)
        if thermal:
            th_out[...] = jnp.zeros(th_out.shape, th_out.dtype)
        divmax_ref[...] = jnp.zeros(divmax_ref.shape, divmax_ref.dtype)
        velmax_ref[...] = jnp.zeros(velmax_ref.shape, velmax_ref.dtype)


def correct_diag_2d_internal(
    grid: GridSpec,
    bcs: BCTable,
    u_star_internal,
    p: Array,
    scale,
    face_codes=None,
    fluid_code=None,
    tile: int = 128,
    interpret: bool = False,
    theta=None,
    scalar_cfg=None,
    dt=None,
):
    """Fused corrector + diagnostics over internal-layout u*; returns
    internal-layout u_new plus (max |div u| over fluid, max |u_a|/h_a) --
    and, with ``theta``/``scalar_cfg``/``dt``, the advanced scalar as a
    fourth result (flux-form update fused into the same pass)."""
    from ..bcs import periodic_axes

    n0, n1 = grid.shape
    h = tuple(float(x) for x in grid.spacing)
    T, G, RP, L = _dims_2d(grid, tile)
    masked = face_codes is not None
    per = tuple(periodic_axes(grid, bcs))
    assert not (masked and any(per)), "obstacles + periodic not supported"
    own = {(a, s): _own_face_2d(bcs, a, s) for a in range(2) for s in (0, 1)}
    thermal = theta is not None
    if thermal:
        assert not masked, "obstacles + thermal not fused"
        assert own[(0, 1)][0] != "copy", \
            "thermal + axis-0 HI outflow not fused"
        from .pallas_kernels import (
            refresh_theta_axis0_ghosts,
            theta_ghost_table,
        )

        thg = theta_ghost_table(scalar_cfg, 2)
        assert thg is not None
        theta = refresh_theta_axis0_ghosts(theta, thg, n0, RP)
    # ONE leading pad row so p window starts can reach row -1
    pp = jnp.pad(p, [(1, RP + 2 - 1 - n0), (0, L - n1)])
    if per[0]:
        # wrap-pad the pressure rows: pad row 0 <-> global row -1 =
        # p[n0-1]; pad row n0+1 <-> global row n0 = p[0] (both axis-0
        # boundary faces then get the identical wrap correction in-kernel)
        upd = jax.lax.dynamic_update_slice_in_dim
        pp = upd(pp, pp[n0:n0 + 1], 0, axis=0)
        pp = upd(pp, pp[1:2], n0 + 1, axis=0)
    # 2 entries: a length-1 SMEM operand trips an XLA windowing check here
    # (slot 1 doubles as dt for the fused thermal update)
    sc = jnp.stack([
        jnp.asarray(scale, jnp.float32),
        (jnp.asarray(dt, jnp.float32) if thermal
         else jnp.zeros((), jnp.float32)),
    ])
    kern = functools.partial(
        _corr2d_kernel, T=T, n=(n0, n1), h=h, own=own, RP=RP, masked=masked,
        per=per, thermal=thermal,
        alpha=float(scalar_cfg.diffusivity) if thermal else 0.0,
        tgamma=float(scalar_cfg.upwind_gamma) if thermal else 0.0,
        thg=thg if thermal else None,
    )
    n_any = 3 + (3 if masked else 0) + (1 if thermal else 0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * n_any
    scratch = [
        pltpu.VMEM((2, T + 16, L), jnp.float32),
        pltpu.VMEM((2, T + 16, L), jnp.float32),
        pltpu.VMEM((2, T + 16, L), jnp.float32),
    ]
    if thermal:
        scratch += [
            pltpu.VMEM((2, T + 16, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((8, L), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    if masked:
        scratch += [
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.VMEM((2, 2 * T, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
    args = (sc, u_star_internal[0], u_star_internal[1], pp)
    if thermal:
        args += (theta,)
    if masked:
        args += (face_codes[0], face_codes[1], fluid_code)
    out_shape = [
        jax.ShapeDtypeStruct((RP, L), jnp.float32),
        jax.ShapeDtypeStruct((RP, L), jnp.float32),
    ]
    vol2 = pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [vol2, vol2]
    if thermal:
        out_shape.append(jax.ShapeDtypeStruct((RP, L), jnp.float32))
        out_specs.append(vol2)
    out_shape += [
        # rank-2 diag partials: mixing rank-3 outputs into a rank-2
        # kernel crashes XLA's custom-call output preparation
        jax.ShapeDtypeStruct((8 * (G + 1), 128), jnp.float32),
        jax.ShapeDtypeStruct((8 * (G + 1), 128), jnp.float32),
    ]
    red2 = pl.BlockSpec((8, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_specs += [red2, red2]
    res = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(G + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if thermal:
        uo, vo, theta_new, divp, velp = res
        return (uo, vo), jnp.max(divp), jnp.max(velp), theta_new
    uo, vo, divp, velp = res
    return (uo, vo), jnp.max(divp), jnp.max(velp)
