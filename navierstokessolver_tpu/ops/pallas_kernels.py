"""Fused Pallas TPU kernels for the hot stencil paths (SURVEY.md SS7 PR3).

The jnp implementations in ops/stencils.py remain the permanent reference
semantics; these kernels are validated against them in interpret mode
(tests/test_pallas.py) -- that is the sanitizer story on TPU (SURVEY.md SS5).

Design: the 2D predictor (advection + diffusion for both velocity
components) is fused into one pass per component over row stripes:

  * inputs live in HBM (``memory_space=ANY``); each grid step DMAs one
    full-width stripe window (T+2 rows incl. halo) into VMEM scratch --
    overlapping halo windows cannot be expressed with BlockSpec tiling
    (index_map has block-index semantics here), so the halo is fetched with
    ``pltpu.make_async_copy`` + ``pl.ds`` element offsets;
  * column neighbors come from in-VMEM shifted slices of the stripe;
  * everything (central/upwind advection blend, 5-point Laplacian, the
    transverse-velocity 4-point average, the Euler update) happens in one
    VPU pass; output is written through a standard tiled BlockSpec.

Boundary-face rows/columns of the outputs are garbage by construction (their
stencil reads zero/edge padding); the caller's BC pass overwrites them, same
as the jnp path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bcs import BCTable, pad_transverse
from ..grid import GridSpec

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to(arr: Array, shape: tuple[int, int]) -> Array:
    return jnp.pad(
        arr, [(0, shape[0] - arr.shape[0]), (0, shape[1] - arr.shape[1])]
    )


def _edge_pad(arr: Array, axis: int) -> Array:
    """One edge-copy ghost on each side along ``axis`` (keeps upwind sane on
    the boundary faces whose results get overwritten by the BC pass)."""
    nd = arr.ndim
    lo = [slice(None)] * nd
    hi = [slice(None)] * nd
    lo[axis] = slice(0, 1)
    hi[axis] = slice(-1, None)
    return jnp.concatenate([arr[tuple(lo)], arr, arr[tuple(hi)]], axis=axis)


def _predictor_component_kernel(
    dt_ref, a_hbm, b_hbm, out_ref, a_scr, b_scr, sems,
    *, T: int, M: int, comp: int, hx: float, hy: float,
    nu: float, gamma: float,
):
    """One row stripe of the fused predictor for one velocity component.

    a_hbm: padded component array, window rows [ti*T, ti*T+T+2), width M+2,
           laid out so a[r+1, c+1] is the component value at (row r, col c).
    b_hbm: other component shifted so b[r, c] pairs the 4-point average
           b[r:r+2, c:c+2] with output point (r, c); width M+1.
    """
    ti = pl.program_id(0)
    # Window heights are T+8 (not T+2/T+1): Mosaic requires DMA slice shapes
    # 8-aligned on the sublane dim; the extra rows are harmless overshoot
    # into the zero padding.
    cp_a = pltpu.make_async_copy(
        a_hbm.at[pl.ds(ti * T, T + 8), :], a_scr, sems.at[0]
    )
    cp_b = pltpu.make_async_copy(
        b_hbm.at[pl.ds(ti * T, T + 8), :], b_scr, sems.at[1]
    )
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    a = a_scr
    c0 = a[1:T + 1, 1:M + 1]              # center
    e = a[2:T + 2, 1:M + 1]               # +row
    w = a[0:T, 1:M + 1]                   # -row
    n = a[1:T + 1, 2:M + 2]               # +col
    s = a[1:T + 1, 0:M]                   # -col
    b = b_scr
    bar = 0.25 * (
        b[0:T, 0:M] + b[1:T + 1, 0:M] + b[0:T, 1:M + 1] + b[1:T + 1, 1:M + 1]
    )

    # transport velocities along (row, col) = grid axes (0, 1)
    vel0 = c0 if comp == 0 else bar
    vel1 = bar if comp == 0 else c0

    inv2hx = 1.0 / (2.0 * hx)
    inv2hy = 1.0 / (2.0 * hy)
    d0_c = (e - w) * inv2hx
    d1_c = (n - s) * inv2hy
    if gamma > 0.0:
        d0_u = jnp.where(vel0 > 0.0, (c0 - w) * (1.0 / hx), (e - c0) * (1.0 / hx))
        d1_u = jnp.where(vel1 > 0.0, (c0 - s) * (1.0 / hy), (n - c0) * (1.0 / hy))
        d0 = gamma * d0_u + (1.0 - gamma) * d0_c
        d1 = gamma * d1_u + (1.0 - gamma) * d1_c
    else:
        d0, d1 = d0_c, d1_c
    adv = vel0 * d0 + vel1 * d1
    lap = (e - 2.0 * c0 + w) * (1.0 / (hx * hx)) + \
          (n - 2.0 * c0 + s) * (1.0 / (hy * hy))
    dt = dt_ref[0]
    out_ref[:, :] = c0 + dt * (nu * lap - adv)


def _component_call(a_pad, b_shift, dt, *, T, NU, M, W, comp, hx, hy, nu,
                    gamma, interpret=False):
    kern = functools.partial(
        _predictor_component_kernel,
        T=T, M=M, comp=comp, hx=hx, hy=hy, nu=nu, gamma=gamma,
    )
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NU, M), jnp.float32),
        grid=(NU // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T + 8, W), jnp.float32),
            pltpu.VMEM((T + 8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dt_arr, a_pad, b_shift)


def predictor_2d_applicable(grid: GridSpec) -> bool:
    return grid.ndim == 2 and grid.dtype == jnp.float32


# ---------------------------------------------------------------------------
# Fused 3D predictor.
#
# Motivation (measured on v5e, 256^3): inside a long lax.scan the jnp 3D
# predictor costs ~6.3 ms/step -- XLA materializes the pad/shift/average
# intermediates (~5 GB of HBM traffic per step). The fused kernels read each
# velocity component once per stripe and do the whole advection + diffusion
# + Euler update in VPU registers.
#
# Design (one pallas_call per component, generic over the component axis):
#   * 3D arrays are TPU-tiled on the last two dims only, so the stripe axis
#     is grid axis 0: free slicing, 1-plane overlap halos, no alignment
#     games and no recompute.
#   * Each component is pre-padded ONCE into a canonical form shared by all
#     three kernels: a 1-cell apron on axes 0 and 1 (BC reflection ghosts on
#     transverse axes, edge duplicates on the staggering axis) and NO apron
#     on the lane axis (axis 2) -- lane ghosts are synthesized in-kernel
#     from a roll plus a linear edge fix (ghost = alpha*center + beta, which
#     expresses wall/inflow reflection, slip/outflow copy, and the
#     staggered-face Dirichlet value). The w component's duplicate boundary
#     face (lane n2) is elided so every canonical array is exactly n2 lanes
#     -- zero lane-padding bloat (this is what sank kernel v1: rounding
#     257-lane windows to 384 cost more than the fusion saved).
#   * The 4-point MAC transverse-velocity averages read the other two
#     components' windows with static slice offsets; out-of-range reads land
#     in aprons/rolls whose garbage only ever reaches boundary-face outputs,
#     which the caller's BC pass overwrites (same contract as 2D).
# ---------------------------------------------------------------------------


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 2)


def _lane_shift(x, sh: int, fix):
    """Neighbor at lane k+sh via roll; ``fix=(edge_idx, alpha, beta)``
    replaces the wrapped edge column with ``alpha*x + beta`` (None: leave the
    wrap garbage -- it only reaches discarded boundary/pad outputs)."""
    r = jnp.roll(x, -sh, axis=2)
    if fix is None:
        return r
    edge, alpha, beta = fix
    return jnp.where(_lane_iota(x.shape) == edge, alpha * x + beta, r)


def _predictor3d_kernel(
    dt_ref, a_hbm, b1_hbm, b2_hbm, out_ref, a_scr, b1_scr, b2_scr, sems,
    *, T: int, OS: int, OL: int, comp: int, t1: int, t2: int,
    h: tuple, nu: float, gamma: float,
    a_fix_lo, a_fix_hi, b_fix: dict,
):
    """One axis-0 stripe of the fused predictor for one velocity component.

    Canonical operand layout: value for output idx lives at
    [idx0 + 1, idx1 + 1, idx2] of each window (aprons on axes 0/1 only).
    """
    i = pl.program_id(0)
    cps = [
        pltpu.make_async_copy(ref.at[pl.ds(i * T, T + 2)], scr, sems.at[k])
        for k, (ref, scr) in enumerate(
            [(a_hbm, a_scr), (b1_hbm, b1_scr), (b2_hbm, b2_scr)]
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    a = a_scr[...]

    def asl(d0, d1, x=None):
        x = a if x is None else x
        return x[d0:d0 + T, d1:d1 + OS, :OL]

    c0 = asl(1, 1)
    neigh = {
        (0, -1): asl(0, 1), (0, +1): asl(2, 1),
        (1, -1): asl(1, 0), (1, +1): asl(1, 2),
        (2, -1): asl(1, 1, _lane_shift(a, -1, a_fix_lo)),
        (2, +1): asl(1, 1, _lane_shift(a, +1, a_fix_hi)),
    }

    def bavg(scr, t):
        # comp_t[idx_comp - 1 + da, idx_t + dt_] averaged over da,dt in {0,1}
        b = scr[...]
        acc = None
        for da in (0, 1):
            for dt_ in (0, 1):
                off = [1, 1]          # axes 0,1 apron offsets
                lane_sh = 0
                for ax, d in ((comp, da - 1), (t, dt_)):
                    if ax == 2:
                        lane_sh += d
                    else:
                        off[ax] += d
                # positive shift reads the elided w face n2 -> needs the fix;
                # a negative shift's wrap column only feeds output face 0
                # (boundary, discarded), so no fix.
                fix = b_fix[t] if lane_sh > 0 else None
                x = b if lane_sh == 0 else _lane_shift(b, lane_sh, fix)
                sl = x[off[0]:off[0] + T, off[1]:off[1] + OS, :OL]
                acc = sl if acc is None else acc + sl
        return 0.25 * acc

    vels = {comp: c0, t1: bavg(b1_scr, t1), t2: bavg(b2_scr, t2)}

    adv = None
    lap = None
    for ax in range(3):
        m = neigh[(ax, -1)]
        p = neigh[(ax, +1)]
        inv2h = 1.0 / (2.0 * h[ax])
        invh2 = 1.0 / (h[ax] * h[ax])
        vel = vels[ax]
        d_c = (p - m) * inv2h
        if gamma > 0.0:
            invh = 1.0 / h[ax]
            d_u = jnp.where(vel > 0.0, (c0 - m) * invh, (p - c0) * invh)
            d = gamma * d_u + (1.0 - gamma) * d_c
        else:
            d = d_c
        term = vel * d
        adv = term if adv is None else adv + term
        lp = (p - 2.0 * c0 + m) * invh2
        lap = lp if lap is None else lap + lp
    dt = dt_ref[0]
    out_ref[...] = c0 + dt * (nu * lap - adv)


def _scalar_bc(bcs: BCTable, face, comp: int, ndim: int):
    v = bcs[face].component(comp, ndim)
    return float(v) if np.isscalar(v) or getattr(v, "ndim", 1) == 0 else None


def predictor_3d_applicable(grid: GridSpec, bcs: BCTable) -> bool:
    from ..bcs import periodic_axes

    if grid.ndim != 3 or grid.dtype != jnp.float32:
        return False
    if any(periodic_axes(grid, bcs)):
        return False
    # in-kernel lane-ghost fixes need scalar BC values on the axis-2 faces
    for side in (0, 1):
        for c in range(3):
            if _scalar_bc(bcs, (2, side), c, 3) is None:
                return False
    return True


def _lane_fixes(grid: GridSpec, bcs: BCTable, c: int):
    """(a_fix_lo, a_fix_hi, face_hi_fix) for canonical array of comp c.

    a_fix_*: edge fixes for the component's own axis-2 neighbor reads.
    face_hi_fix: fix reconstructing w's elided boundary face (c == 2 only),
    also used when other kernels average w at lane n2-1 with shift +1.
    """
    from ..bcs import BCKind

    n2 = grid.shape[2]
    lo_bc = bcs[(2, 0)]
    hi_bc = bcs[(2, 1)]

    def tangential(bc, edge):
        if bc.kind in (BCKind.WALL, BCKind.INFLOW):
            return (edge, -1.0, 2.0 * _scalar_bc(bcs, (2, 0 if edge == 0 else 1), c, 3))
        return (edge, 1.0, 0.0)      # slip/outflow: ghost = edge copy

    if c != 2:
        # axis 2 is transverse: reflection ghosts both sides
        return tangential(lo_bc, 0), tangential(hi_bc, n2 - 1), \
            tangential(hi_bc, n2 - 1)
    # c == 2: axis 2 is the staggering axis. Low side: face -1 is never used
    # by a kept output (face 0 is boundary). High side: the elided face n2
    # value -- Dirichlet BC value for wall/inflow/slip, copy for outflow.
    if hi_bc.kind is BCKind.OUTFLOW:
        fix = (n2 - 1, 1.0, 0.0)
    else:
        fix = (n2 - 1, 0.0, _scalar_bc(bcs, (2, 1), 2, 3))
    return None, fix, fix


def predictor_3d(
    grid: GridSpec,
    bcs: BCTable,
    u: Sequence[Array],
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    tile: int = 32,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused Pallas 3D predictor; same contract as the 2D kernel (boundary
    faces carry garbage for the caller's BC pass to overwrite)."""
    h = grid.spacing
    n = grid.shape
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    T = tile
    NP0 = _round_up(n[0] + 1, T)            # covers every component's e0
    S1 = _round_up(_round_up(n[1] + 1, 8) + 2, 8)
    L2 = _round_up(n[2], 128)
    shape_pad = (NP0 + 2, S1, L2)

    # canonical padded components (built once, shared by all three kernels):
    # aprons on axes 0 and 1 only (pad_transverse would also pad axis 2,
    # whose ghosts are synthesized in-kernel), lanes exact.
    fixes = [_lane_fixes(grid, bcs, c) for c in range(3)]
    from ..bcs import BCKind, _face_slice

    def ghost_pad(c, x, ax):
        lo_bc = bcs[(ax, 0)]
        hi_bc = bcs[(ax, 1)]
        e_lo = _face_slice(x, ax, slice(0, 1))
        e_hi = _face_slice(x, ax, slice(-1, None))
        def ghost(bc, edge, side):
            if bc.kind in (BCKind.WALL, BCKind.INFLOW):
                val = jnp.asarray(bc.component(c, 3), grid.dtype)
                return jnp.broadcast_to(2.0 * val - edge, edge.shape)
            return edge
        return jnp.concatenate(
            [ghost(lo_bc, e_lo, 0), x, ghost(hi_bc, e_hi, 1)], axis=ax
        )

    canon = []
    for c in range(3):
        x = u[c][:, :, :-1] if c == 2 else u[c]
        for ax in (0, 1):
            x = _edge_pad(x, ax) if ax == c else ghost_pad(c, x, ax)
        x = jnp.pad(x, [(0, shape_pad[d] - x.shape[d]) for d in range(3)])
        canon.append(x)

    out = []
    for a in range(3):
        t1, t2 = [t for t in range(3) if t != a]
        e = list(grid.face_shape(a))
        if a == 2:
            e[2] -= 1                        # elided face, re-appended below
        OS = _round_up(e[1], 8)
        OL = L2
        b_fix = {t: fixes[t][2] for t in (t1, t2)}
        kern = functools.partial(
            _predictor3d_kernel,
            T=T, OS=OS, OL=OL, comp=a, t1=t1, t2=t2,
            h=tuple(float(x) for x in h), nu=nu, gamma=upwind_gamma,
            a_fix_lo=fixes[a][0], a_fix_hi=fixes[a][1], b_fix=b_fix,
        )
        res = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NP0, OS, OL), jnp.float32),
            grid=(NP0 // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (T, OS, OL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((T + 2, S1, L2), jnp.float32),
                pltpu.VMEM((T + 2, S1, L2), jnp.float32),
                pltpu.VMEM((T + 2, S1, L2), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(dt_arr, canon[a], canon[t1], canon[t2])
        res = res[: e[0], : e[1], : e[2]]
        if a == 2:
            # re-append the elided boundary face (BC-pass territory)
            res = jnp.concatenate([res, res[:, :, -1:]], axis=2)
        out.append(res)
    return tuple(out)


# ---------------------------------------------------------------------------
# Fused red-black sweep kernel (SURVEY.md SS7 PR3 kernel #2: the Poisson
# relaxation operator). K full RB sweeps per kernel invocation via
# overlap-recompute: each row stripe is loaded with a 32-row halo on each
# side (32 = int8 sublane tile, so the uint8 stencil-code DMA stays aligned),
# every pass is computed over the whole stripe, and edge contamination
# creeps inward one row per color pass -- 2K <= 8 rows << 32, so the T
# output rows stay exact. One invocation therefore streams p/b/diag/code
# from HBM ONCE for K sweeps instead of XLA's once per color pass, and the
# division is hoisted into a per-invocation reciprocal:
#   gs = b*inv_d - (cl0*up + ch0*dn + cl1*lf + ch1*rt)
# with the gs-ready planes cl/ch = w_a * presence_bit * inv_d decoded from
# the uint8 code once per invocation.
#
# Measured outcome (v5e, 2048^2, K=4): 0.157 ms/sweep vs 0.138 for XLA's
# fusion of the same compressed stencil -- each color pass is bound by VMEM
# bandwidth (~9 plane reads/pass at ~3.5 TB/s), not HBM, so amortizing HBM
# across K sweeps does not pay. Kept as a validated alternative (default off
# in MGPoissonSolver) and as the experimentation base; the jnp path stays
# the production smoother.
# ---------------------------------------------------------------------------

_HALO = 32


def _rb_sweep_kernel(
    p_hbm, b_hbm, d_hbm, c_hbm, out_ref,
    p_scr, b_scr, d_scr, c_scr, sems,
    *, T: int, W: int, n_sweeps: int, omega: float,
    w0: float, w1: float,
):
    i = pl.program_id(0)
    R = T + 2 * _HALO
    cps = [
        pltpu.make_async_copy(ref.at[pl.ds(i * T, R), :], scr, sems.at[k])
        for k, (ref, scr) in enumerate(
            [(p_hbm, p_scr), (b_hbm, b_scr), (d_hbm, d_scr), (c_hbm, c_scr)]
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    c = c_scr[...].astype(jnp.int32)
    inv_d = 1.0 / d_scr[...]
    f32 = jnp.float32
    cl0 = jnp.where((c & 1) > 0, w0, 0.0).astype(f32) * inv_d
    ch0 = jnp.where((c & 2) > 0, w0, 0.0).astype(f32) * inv_d
    cl1 = jnp.where((c & 4) > 0, w1, 0.0).astype(f32) * inv_d
    ch1 = jnp.where((c & 8) > 0, w1, 0.0).astype(f32) * inv_d
    bd = b_scr[...] * inv_d

    # global parity of each cell: rows offset by the stripe start (the padded
    # array starts _HALO rows before global row 0, and _HALO is even, so the
    # offset i*T keeps true global parity).
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + i * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    red = ((rows + cols) & 1) == 0

    p = p_scr[...]
    for _ in range(n_sweeps):
        for is_red in (True, False):
            up = jnp.concatenate([p[:1], p[:-1]], axis=0)
            dn = jnp.concatenate([p[1:], p[-1:]], axis=0)
            lf = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
            rt = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
            gs = bd - (cl0 * up + ch0 * dn + cl1 * lf + ch1 * rt)
            if omega != 1.0:
                gs = (1.0 - omega) * p + omega * gs
            # Non-fluid cells have b=0, couplings=0, diag=1 => gs=0=p, so no
            # fluid gate is needed (matches ops/poisson._rb_sweep given the
            # solver's p0*fluid entry invariant).
            p = jnp.where(red, gs, p) if is_red else jnp.where(red, p, gs)
    out_ref[:, :] = p[_HALO:T + _HALO, :]


def rb_sweeps_applicable(shape: tuple[int, ...], dtype) -> bool:
    return len(shape) == 2 and dtype == jnp.float32 and min(shape) >= 128


def rb_sweeps(
    op,
    p: Array,
    b: Array,
    omega: float,
    n_sweeps: int,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    """``n_sweeps`` red-black sweeps, fused into one Pallas pass over HBM.

    Semantically identical to ``n_sweeps`` x ``ops.poisson._rb_sweep`` for
    states satisfying the solver invariant p = p*fluid (validated in
    tests/test_pallas.py, interpret mode). n_sweeps <= 8 so halo recompute
    contamination stays within the 32-row halo.
    """
    if not 1 <= n_sweeps <= 8:
        raise ValueError("n_sweeps must be in [1, 8]")
    n0, n1 = p.shape
    T = min(tile, _round_up(n0, 8))
    NP = _round_up(n0, T)
    W = _round_up(n1, 128)

    def padded(x, fill=0.0):
        out = jnp.full((NP + 2 * _HALO, W), fill, x.dtype)
        return jax.lax.dynamic_update_slice(out, x, (_HALO, 0))

    p_pad = padded(p)
    b_pad = padded(b)
    d_pad = padded(op.diag, 1.0)     # pad diag with 1: no 0-division NaNs
    c_pad = padded(op.code, 0)

    kern = functools.partial(
        _rb_sweep_kernel,
        T=T, W=W, n_sweeps=n_sweeps, omega=omega,
        w0=op.w[0], w1=op.w[1],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NP, W), jnp.float32),
        grid=(NP // T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        # The working set (stripe + coefficient planes + shift temporaries)
        # exceeds the default 16M scoped-vmem cap; v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p_pad, b_pad, d_pad, c_pad)
    return out[:n0, :n1]


def predictor_2d(
    grid: GridSpec,
    bcs: BCTable,
    u: Sequence[Array],
    dt: float,
    nu: float,
    upwind_gamma: float = 0.0,
    tile: int = 128,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Fused Pallas predictor: returns (u*, v*) on the full face arrays.

    Matches ops/stencils.predictor on interior faces; boundary faces carry
    garbage that the caller's apply_velocity_bcs overwrites (same contract).
    """
    hx, hy = grid.spacing
    nx, ny = grid.shape
    uu, vv = u

    # ---- u component -----------------------------------------------------
    # A: BC ghosts along y (transverse), edge ghosts along x, zero-pad to tiles
    # plus the 8-row DMA overshoot and a lane-aligned width shared with B.
    A = _edge_pad(pad_transverse(grid, bcs, 0, uu), axis=0)  # (nx+3, ny+2)
    T = min(tile, _round_up(nx + 1, 8))
    NU = _round_up(nx + 1, T)
    MU = ny
    WU = _round_up(MU + 2, 128)
    A = _pad_to(A, (NU + 8, WU))
    # B[i, j] = v[i-1, j]
    B = jnp.pad(vv, [(1, 0), (0, 0)])     # (nx+1, ny+1)
    B = _pad_to(B, (NU + 8, WU))
    u_star = _component_call(
        A, B, dt, T=T, NU=NU, M=MU, W=WU, comp=0, hx=hx, hy=hy, nu=nu,
        gamma=upwind_gamma, interpret=interpret,
    )[: nx + 1, :ny]

    # ---- v component -----------------------------------------------------
    C = _edge_pad(pad_transverse(grid, bcs, 1, vv), axis=1)  # (nx+2, ny+3)
    Tv = min(tile, _round_up(nx, 8))
    NV = _round_up(nx, Tv)
    MV = ny + 1
    WV = _round_up(MV + 2, 128)
    C = _pad_to(C, (NV + 8, WV))
    # D[i, j] = u[i, j-1]
    D = jnp.pad(uu, [(0, 0), (1, 0)])     # (nx+1, ny+1)
    D = _pad_to(D, (NV + 8, WV))
    v_star = _component_call(
        C, D, dt, T=Tv, NU=NV, M=MV, W=WV, comp=1, hx=hx, hy=hy, nu=nu,
        gamma=upwind_gamma, interpret=interpret,
    )[:nx, : ny + 1]

    return u_star, v_star
