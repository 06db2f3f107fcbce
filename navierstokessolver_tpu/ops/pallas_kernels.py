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
from typing import Optional, Sequence

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
    dt_ref, a_hbm, b1_hbm, b2_hbm, *rest,
    T: int, OS: int, OL: int, comp: int, t1: int, t2: int,
    h: tuple, nu: float, gamma: float,
    a_fix_lo, a_fix_hi, b_fix: dict,
    les: bool = False, b_lo_fix: dict = None,
    nt_fix_lo=None, nt_fix_hi=None,
):
    """One axis-0 stripe of the fused predictor for one velocity component.

    Canonical operand layout: value for output idx lives at
    [idx0 + 1, idx1 + 1, idx2] of each window (aprons on axes 0/1 only).

    ``les=True`` streams a fourth canonical operand -- the cell-centered
    eddy viscosity -- and adds the Smagorinsky subgrid-stress divergence
    ``d/dx_b (2 nu_t S_comp,b)`` to the update in-register (every strain/
    viscosity read stays within the standard +-1 apron/roll reach because
    nu_t arrives precomputed; see les.py for the model and the jnp
    reference semantics this must match).
    """
    if les:
        (nt_hbm, out_ref, a_scr, b1_scr, b2_scr, nt_scr, sems) = rest
        pairs = [(a_hbm, a_scr), (b1_hbm, b1_scr), (b2_hbm, b2_scr),
                 (nt_hbm, nt_scr)]
    else:
        (out_ref, a_scr, b1_scr, b2_scr, sems) = rest
        pairs = [(a_hbm, a_scr), (b1_hbm, b1_scr), (b2_hbm, b2_scr)]
    i = pl.program_id(0)
    cps = [
        pltpu.make_async_copy(ref.at[pl.ds(i * T, T + 2)], scr, sems.at[k])
        for k, (ref, scr) in enumerate(pairs)
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
    rhs = nu * lap - adv

    if les:
        # Subgrid stress divergence F_comp = sum_b d/dx_b (2 nu_t S_comp,b)
        # at comp's faces. Window reads by per-GRID-AXIS offsets: axes 0/1
        # land in the aprons, axis 2 is a roll with the window's own lane
        # fixes (lo for negative shifts, hi for positive).
        def rd(scr, offs: dict, lo_fix, hi_fix):
            x = scr[...]
            o = [offs.get(ax, 0) for ax in range(3)]
            if o[2]:
                x = _lane_shift(x, o[2], lo_fix if o[2] < 0 else hi_fix)
            return x[1 + o[0]:1 + o[0] + T, 1 + o[1]:1 + o[1] + OS, :OL]

        def rd_a(offs):
            return rd(a_scr, offs, a_fix_lo, a_fix_hi)

        def rd_nt(offs):
            return rd(nt_scr, offs, nt_fix_lo, nt_fix_hi)

        inv = tuple(1.0 / h[ax] for ax in range(3))
        # own-axis term: (tau_cc(cell 0) - tau_cc(cell -1)) / h_c with
        # tau_cc(cell d) = 2 nu_t(d) * (u_c(face d+1) - u_c(face d)) / h_c
        f = None
        for dc, sgn in ((0, 1.0), (-1, -1.0)):
            s_cc = (rd_a({comp: dc + 1}) - rd_a({comp: dc})) * inv[comp]
            term = (sgn * 2.0 * inv[comp]) * rd_nt({comp: dc}) * s_cc
            f = term if f is None else f + term
        # transverse terms: (tau_ct(edge 1) - tau_ct(edge 0)) / h_t where
        # edge d sits at t-node (cell index + d) and comp-node 0 (the face)
        for t, scr in ((t1, b1_scr), (t2, b2_scr)):
            blo = b_lo_fix[t]
            bhi = b_fix[t]
            for d, sgn in ((1, 1.0), (0, -1.0)):
                du_c = (rd_a({t: d}) - rd_a({t: d - 1})) * inv[t]
                du_t = (rd(scr, {t: d, comp: 0}, blo, bhi)
                        - rd(scr, {t: d, comp: -1}, blo, bhi)) * inv[comp]
                s_ct = 0.5 * (du_c + du_t)
                nt_e = 0.25 * (
                    rd_nt({comp: -1, t: d - 1}) + rd_nt({comp: 0, t: d - 1})
                    + rd_nt({comp: -1, t: d}) + rd_nt({comp: 0, t: d})
                )
                f = f + (sgn * 2.0 * inv[t]) * nt_e * s_ct
        rhs = rhs + f

    out_ref[...] = c0 + dt * rhs


def _scalar_bc(bcs: BCTable, face, comp: int, ndim: int,
               allow_traced: bool = False):
    v = bcs[face].component(comp, ndim)
    if not (np.isscalar(v) or getattr(v, "ndim", 1) == 0):
        return None
    try:
        return float(v)
    except Exception:
        # traced value (time-dependent BC resolved inside jit) or other
        # non-concretizable scalar: not bake-able into a kernel. The
        # fused 3D whole-step CAN take it (allow_traced): the wrappers
        # hoist traced table values into the kernels' SMEM scalar vector
        # (_hoist_tables) and the kernel bodies read them back
        # (_resolve_tables), so only that path opts in.
        return v if allow_traced else None


def predictor_3d_applicable(grid: GridSpec, bcs: BCTable) -> bool:
    from ..bcs import BCKind, periodic_axes

    if grid.ndim != 3 or grid.dtype != jnp.float32:
        return False
    per = periodic_axes(grid, bcs)
    if per[2] and grid.shape[2] % 128:
        # lane wrap is exact only without lane padding (roll == wraparound)
        return False
    if any(bcs[(a, s)].kind is BCKind.CONVECTIVE
           for a in range(3) for s in (0, 1)):
        return False
    # in-kernel lane-ghost fixes need scalar BC values on the axis-2 faces
    # (periodic lanes need no values: the roll IS the wrap)
    if not per[2]:
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
    if lo_bc.kind is BCKind.PERIODIC:
        # exact-lane wrap (applicability requires n2 % 128 == 0): the
        # in-kernel roll IS the periodic neighbor, for every component --
        # including comp 2, whose elided duplicate face n2 == face 0 makes
        # the rolled lane 0 exactly the face-n2 value.
        return None, None, None

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


def _canon_dims_3d(grid: GridSpec, tile=None):
    """(T, NP0, S1, L2, shape_pad) of the canonical padded 3D operands."""
    n = grid.shape
    if tile is None:
        # scale the stripe height to the plane footprint so the three
        # canonical windows + output block stay within VMEM (512-wide
        # planes need ~4x shorter stripes than 256-wide ones)
        plane = _round_up(n[1] + 1, 8) * _round_up(n[2], 128)
        tile = 32 if plane <= 128 * 1024 else 8
    T = tile
    NP0 = _round_up(n[0] + 1, T)            # covers every component's e0
    S1 = _round_up(_round_up(n[1] + 1, 8) + 2, 8)
    L2 = _round_up(n[2], 128)
    return T, NP0, S1, L2, (NP0 + 2, S1, L2)


def bc_ghost_slab_3d(grid: GridSpec, bcs: BCTable, c: int, x: Array,
                     ax: int, side: int) -> Array:
    """BC ghost plane of component ``c`` along TRANSVERSE axis ``ax``:
    reflection ``2 v_bc - edge`` at wall/inflow, edge copy otherwise."""
    from ..bcs import BCKind, _face_slice

    bc = bcs[(ax, side)]
    if bc.kind is BCKind.PERIODIC:
        # wrap: the ghost plane is the OPPOSITE edge plane
        return _face_slice(
            x, ax, slice(-1, None) if side == 0 else slice(0, 1)
        )
    edge = _face_slice(x, ax, slice(0, 1) if side == 0 else slice(-1, None))
    if bc.kind in (BCKind.WALL, BCKind.INFLOW):
        val = jnp.asarray(bc.component(c, grid.ndim), grid.dtype)
        return jnp.broadcast_to(2.0 * val - edge, edge.shape)
    return edge


def predictor_3d_from_canon(
    grid: GridSpec,
    bcs: BCTable,
    canon: Sequence[Array],
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    tile: int = None,
    interpret: bool = False,
    nt_canon: Array = None,
) -> tuple[Array, Array, Array]:
    """Kernel invocations over pre-built canonical operands (see
    :func:`predictor_3d` for the canonical layout). Split out so the
    sharded wrapper (parallel/pallas_sharded.py) can splice ppermute halo
    planes into the canon instead of BC ghosts and reuse the kernels
    verbatim on its local block. ``nt_canon`` (canonical cell-centered
    eddy viscosity; replicate/wrap aprons) switches on the in-kernel LES
    subgrid-stress term."""
    from ..bcs import periodic_axes

    h = grid.spacing
    n = grid.shape
    T, NP0, S1, L2, shape_pad = _canon_dims_3d(grid, tile)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)
    fixes = [_lane_fixes(grid, bcs, c) for c in range(3)]
    les = nt_canon is not None
    if les:
        n2 = n[2]
        if periodic_axes(grid, bcs)[2]:
            nt_fix_lo = nt_fix_hi = None       # lane roll IS the wrap
        else:
            nt_fix_lo = (0, 1.0, 0.0)          # edge-replicate ghosts,
            nt_fix_hi = (n2 - 1, 1.0, 0.0)     # matching les._pad_cells
    else:
        nt_fix_lo = nt_fix_hi = None

    out = []
    for a in range(3):
        t1, t2 = [t for t in range(3) if t != a]
        e = list(grid.face_shape(a))
        if a == 2:
            e[2] -= 1                        # elided face, re-appended below
        OS = _round_up(e[1], 8)
        OL = L2
        b_fix = {t: fixes[t][2] for t in (t1, t2)}
        b_lo_fix = {t: fixes[t][0] for t in (t1, t2)}
        kern = functools.partial(
            _predictor3d_kernel,
            T=T, OS=OS, OL=OL, comp=a, t1=t1, t2=t2,
            h=tuple(float(x) for x in h), nu=nu, gamma=upwind_gamma,
            a_fix_lo=fixes[a][0], a_fix_hi=fixes[a][1], b_fix=b_fix,
            les=les, b_lo_fix=b_lo_fix,
            nt_fix_lo=nt_fix_lo, nt_fix_hi=nt_fix_hi,
        )
        n_in = 4 if les else 3
        scratch = [pltpu.VMEM((T + 2, S1, L2), jnp.float32)
                   for _ in range(n_in)]
        scratch.append(pltpu.SemaphoreType.DMA((n_in,)))
        args = [dt_arr, canon[a], canon[t1], canon[t2]]
        if les:
            args.append(nt_canon)
        res = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NP0, OS, OL), jnp.float32),
            grid=(NP0 // T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=pl.BlockSpec(
                (T, OS, OL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        res = res[: e[0], : e[1], : e[2]]
        if a == 2:
            # re-append the elided boundary face (BC-pass territory)
            res = jnp.concatenate([res, res[:, :, -1:]], axis=2)
        out.append(res)
    return tuple(out)


def build_canon_3d(
    grid: GridSpec, bcs: BCTable, u: Sequence[Array], tile: int = None
) -> list:
    """The canonical padded components shared by all per-component 3D
    kernels: aprons on axes 0 and 1 only (pad_transverse would also pad
    axis 2, whose ghosts are synthesized in-kernel), lanes exact."""
    from ..bcs import _face_slice, periodic_axes

    _, _, _, _, shape_pad = _canon_dims_3d(grid, tile)
    per = periodic_axes(grid, bcs)
    canon = []
    for c in range(3):
        x = u[c][:, :, :-1] if c == 2 else u[c]
        for ax in (0, 1):
            if ax == c:
                if per[ax]:
                    # staggered periodic: x carries the duplicate boundary
                    # face (x[n] == x[0]); face -1 == face n-1, face n+1 ==
                    # face 1
                    nfc = grid.shape[ax]
                    lo = _face_slice(x, ax, slice(nfc - 1, nfc))
                    hi = _face_slice(x, ax, slice(1, 2))
                    x = jnp.concatenate([lo, x, hi], axis=ax)
                else:
                    x = _edge_pad(x, ax)
            else:
                x = jnp.concatenate(
                    [
                        bc_ghost_slab_3d(grid, bcs, c, x, ax, 0),
                        x,
                        bc_ghost_slab_3d(grid, bcs, c, x, ax, 1),
                    ],
                    axis=ax,
                )
        x = jnp.pad(x, [(0, shape_pad[d] - x.shape[d]) for d in range(3)])
        canon.append(x)
    return canon


def nt_canon_3d(
    grid: GridSpec, bcs: BCTable, nu_t: Array, tile: int = None
) -> Array:
    """Cell-centered viscosity canon: replicate (zero-normal-gradient) or
    wrap ghosts on axes 0/1 -- the same closure as les._pad_cells, so the
    in-kernel edge averages match the jnp stress exactly."""
    from ..bcs import _face_slice, periodic_axes

    _, _, _, _, shape_pad = _canon_dims_3d(grid, tile)
    per = periodic_axes(grid, bcs)
    x = nu_t
    for ax in (0, 1):
        if per[ax]:
            lo = _face_slice(x, ax, slice(-1, None))
            hi = _face_slice(x, ax, slice(0, 1))
        else:
            lo = _face_slice(x, ax, slice(0, 1))
            hi = _face_slice(x, ax, slice(-1, None))
        x = jnp.concatenate([lo, x, hi], axis=ax)
    return jnp.pad(x, [(0, shape_pad[d] - x.shape[d]) for d in range(3)])


def predictor_3d(
    grid: GridSpec,
    bcs: BCTable,
    u: Sequence[Array],
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    tile: int = None,
    interpret: bool = False,
    nu_t: Array = None,
) -> tuple[Array, Array, Array]:
    """Fused Pallas 3D predictor; same contract as the 2D kernel (boundary
    faces carry garbage for the caller's BC pass to overwrite). ``nu_t``
    (cell-centered eddy viscosity, e.g. les.eddy_viscosity) adds the LES
    subgrid-stress divergence in-kernel -- bit-compatible with the jnp
    path ``stencils.predictor(..., forcing=les.sgs_forcing(...))``."""
    T, NP0, S1, L2, shape_pad = _canon_dims_3d(grid, tile)
    canon = build_canon_3d(grid, bcs, u, tile)
    nt_canon = (nt_canon_3d(grid, bcs, nu_t, tile)
                if nu_t is not None else None)
    return predictor_3d_from_canon(
        grid, bcs, canon, dt, nu, upwind_gamma, T, interpret,
        nt_canon=nt_canon,
    )


def _nu_t3d_kernel(
    scale_ref, u0_hbm, u1_hbm, u2_hbm, out_ref, s0, s1, s2, sems,
    *, T: int, OS: int, OL: int, h: tuple, fix_lo: tuple, fix_hi: tuple,
):
    """Cell-centered Smagorinsky eddy viscosity for one axis-0 stripe.

    Reads the three canonical velocity windows once and evaluates
    ``nu_t = scale * sqrt(2 S_ij S_ij)`` with the strain tensor collocated
    at cell centers. The 4-edge average of each off-diagonal S_ab
    telescopes into central differences,

        <du_a/dx_b>_center = [ (u_a|_{d_a=0} + u_a|_{d_a=1})(b+1)
                             - (... )(b-1) ] / (4 h_b),

    algebraically identical to les._center_strain_tensor's
    average-of-edges over the same ghost values (pad_transverse aprons on
    axes 0/1; lane roll + linear edge fixes on axis 2), so the output
    matches the jnp eddy_viscosity to f32 roundoff.
    """
    i = pl.program_id(0)
    cps = [
        pltpu.make_async_copy(ref.at[pl.ds(i * T, T + 2)], scr, sems.at[k])
        for k, (ref, scr) in enumerate(
            [(u0_hbm, s0), (u1_hbm, s1), (u2_hbm, s2)]
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    scrs = (s0, s1, s2)

    def rd(c, offs: dict):
        x = scrs[c][...]
        o = [offs.get(ax, 0) for ax in range(3)]
        if o[2]:
            x = _lane_shift(x, o[2], fix_lo[c] if o[2] < 0 else fix_hi[c])
        return x[1 + o[0]:1 + o[0] + T, 1 + o[1]:1 + o[1] + OS, :OL]

    inv = tuple(1.0 / h[ax] for ax in range(3))
    s2sum = None
    for a in range(3):
        saa = (rd(a, {a: 1}) - rd(a, {a: 0})) * inv[a]
        term = saa * saa
        s2sum = term if s2sum is None else s2sum + term
    for a in range(3):
        for b in range(a + 1, 3):
            d_ab = (0.25 * inv[b]) * (
                (rd(a, {a: 0, b: 1}) - rd(a, {a: 0, b: -1}))
                + (rd(a, {a: 1, b: 1}) - rd(a, {a: 1, b: -1}))
            )
            d_ba = (0.25 * inv[a]) * (
                (rd(b, {b: 0, a: 1}) - rd(b, {b: 0, a: -1}))
                + (rd(b, {b: 1, a: 1}) - rd(b, {b: 1, a: -1}))
            )
            s_ab = 0.5 * (d_ab + d_ba)
            s2sum = s2sum + 2.0 * (s_ab * s_ab)
    out_ref[...] = scale_ref[0] * jnp.sqrt(2.0 * s2sum)


def nu_t_3d_from_canon(
    grid: GridSpec,
    bcs: BCTable,
    canon: Sequence[Array],
    cs2_delta2: float,
    tile: int = None,
    interpret: bool = False,
) -> Array:
    """Pallas cell-centered Smagorinsky ``nu_t = cs^2 Delta^2 |S|`` from
    the canonical velocity operands (build_canon_3d). Static-coefficient
    only (the Germano-dynamic model's test filter needs wider support and
    stays jnp). Returns the exact (n0, n1, n2) field."""
    n = grid.shape
    T, NP0, S1, L2, shape_pad = _canon_dims_3d(grid, tile)
    fixes = [_lane_fixes(grid, bcs, c) for c in range(3)]
    # comp 0/1: axis 2 transverse (reflection fixes both sides); comp 2:
    # own-axis reads are 0/+1 only -- +1 at lane n2-1 is the elided
    # boundary face, reconstructed by the face_hi fix
    fix_lo = (fixes[0][0], fixes[1][0], None)
    fix_hi = (fixes[0][1], fixes[1][1], fixes[2][2])
    NPC = _round_up(n[0], T)
    OS = _round_up(n[1], 8)
    kern = functools.partial(
        _nu_t3d_kernel,
        T=T, OS=OS, OL=L2, h=tuple(float(x) for x in grid.spacing),
        fix_lo=fix_lo, fix_hi=fix_hi,
    )
    scale = jnp.asarray(cs2_delta2, jnp.float32).reshape(1)
    res = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NPC, OS, L2), jnp.float32),
        grid=(NPC // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (T, OS, L2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((T + 2, S1, L2), jnp.float32) for _ in range(3)
        ] + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scale, canon[0], canon[1], canon[2])
    return res[: n[0], : n[1], : n[2]]


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


# -- fused V-cycle level kernels (geometric multigrid, 2D) -------------------
#
# One V-cycle level in the jnp path costs 6+ HBM passes at the fine grid:
# `pre` sweeps + residual (apply_A) + restrict on the way down, prolong+add +
# `post` sweeps + the solve loop's residual-norm check on the way up. These
# two kernels collapse that to TWO passes: K1 = pre-smooth + residual (the
# restriction's 4:1 pairing stays in XLA on the already-written residual),
# K2 = correction-add + post-smooth + the CONVERGENCE residual's per-stripe
# sum-of-squares partials, which makes the while_loop's stopping check free.
# Same halo-recompute scheme as rb_sweeps (_HALO=32 covers <=8 sweeps of
# contamination plus the +-1 residual stencil).


def mg_fused_applicable(op) -> bool:
    """The fused level kernels: 2D f32, >=128 per side (VMEM stripe tiling),
    non-periodic (the in-kernel neighbor shifts are edge-clamped; wrap
    couplings would read the wrong cell)."""
    return (
        op.diag.ndim == 2
        and op.diag.dtype == jnp.float32
        and min(op.diag.shape) >= 128
        and not any(op.periodic)
    )


def _mg_decode(c_scr, *, w0: float, w1: float):
    """uint8 stencil code -> coupling/fluid planes (poisson.PoissonOp bits:
    1/2 axis-0 lo/hi, 4/8 axis-1 lo/hi, 64 fluid)."""
    c = c_scr[...].astype(jnp.int32)
    f32 = jnp.float32
    l0 = jnp.where((c & 1) > 0, w0, 0.0).astype(f32)
    h0 = jnp.where((c & 2) > 0, w0, 0.0).astype(f32)
    l1 = jnp.where((c & 4) > 0, w1, 0.0).astype(f32)
    h1 = jnp.where((c & 8) > 0, w1, 0.0).astype(f32)
    fluid = jnp.where((c & 64) > 0, 1.0, 0.0).astype(f32)
    return l0, h0, l1, h1, fluid


def _shift4(p):
    up = jnp.concatenate([p[:1], p[:-1]], axis=0)
    dn = jnp.concatenate([p[1:], p[-1:]], axis=0)
    lf = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
    rt = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    return up, dn, lf, rt


def _mg_sweep_loop(p, bd, cl0, ch0, cl1, ch1, red, omega, n):
    """n red-black sweeps; coefficients are pre-divided by diag (cf.
    _rb_sweep_kernel, whose semantics these share)."""
    for _ in range(n):
        for is_red in (True, False):
            up, dn, lf, rt = _shift4(p)
            gs = bd - (cl0 * up + ch0 * dn + cl1 * lf + ch1 * rt)
            if omega != 1.0:
                gs = (1.0 - omega) * p + omega * gs
            p = jnp.where(red, gs, p) if is_red else jnp.where(red, p, gs)
    return p


def _mg_residual_plane(p, b, d, l0, h0, l1, h1, fluid):
    """(b - A p) * fluid with A p = diag*p + sum couplings*neighbors."""
    up, dn, lf, rt = _shift4(p)
    return (b - (d * p + l0 * up + h0 * dn + l1 * lf + h1 * rt)) * fluid


def _mg_pre_kernel(
    p_hbm, b_hbm, d_hbm, c_hbm, outp_ref, outr_ref,
    p_scr, b_scr, d_scr, c_scr, sems,
    *, T: int, W: int, n_sweeps: int, omega: float, w0: float, w1: float,
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

    l0, h0, l1, h1, fluid = _mg_decode(c_scr, w0=w0, w1=w1)
    d = d_scr[...]
    inv_d = 1.0 / d
    bd = b_scr[...] * inv_d
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + i * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    red = ((rows + cols) & 1) == 0
    p = _mg_sweep_loop(
        p_scr[...], bd, l0 * inv_d, h0 * inv_d, l1 * inv_d, h1 * inv_d,
        red, omega, n_sweeps,
    )
    r = _mg_residual_plane(p, b_scr[...], d, l0, h0, l1, h1, fluid)
    outp_ref[:, :] = p[_HALO:T + _HALO, :]
    outr_ref[:, :] = r[_HALO:T + _HALO, :]


def _mg_post_kernel(
    p_hbm, b_hbm, d_hbm, c_hbm, e_hbm, outp_ref, rsq_ref,
    p_scr, b_scr, d_scr, c_scr, e_scr, sems,
    *, T: int, W: int, n_sweeps: int, omega: float, w0: float, w1: float,
):
    i = pl.program_id(0)
    R = T + 2 * _HALO
    cps = [
        pltpu.make_async_copy(ref.at[pl.ds(i * T, R), :], scr, sems.at[k])
        for k, (ref, scr) in enumerate(
            [(p_hbm, p_scr), (b_hbm, b_scr), (d_hbm, d_scr),
             (c_hbm, c_scr), (e_hbm, e_scr)]
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    l0, h0, l1, h1, fluid = _mg_decode(c_scr, w0=w0, w1=w1)
    d = d_scr[...]
    inv_d = 1.0 / d
    bd = b_scr[...] * inv_d
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + i * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    red = ((rows + cols) & 1) == 0
    p0 = (p_scr[...] + e_scr[...]) * fluid
    p = _mg_sweep_loop(
        p0, bd, l0 * inv_d, h0 * inv_d, l1 * inv_d, h1 * inv_d,
        red, omega, n_sweeps,
    )
    r = _mg_residual_plane(p, b_scr[...], d, l0, h0, l1, h1, fluid)
    outp_ref[:, :] = p[_HALO:T + _HALO, :]
    rv = r[_HALO:T + _HALO, :]
    # Per-stripe partial sum in an (8,128) VMEM tile (TPU lowering rejects
    # sub-(8,128) output blocks); element [0,0] carries the value, the rest
    # stay zero so the host-side jnp.sum over [:, 0, 0] reads it exactly.
    total = jnp.sum(rv * rv)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rsq_ref[:, :] = jnp.where((row == 0) & (col == 0), total, 0.0)


def _mg_pad_planes(arrays, NP: int, W: int):
    def padded(x, fill):
        out = jnp.full((NP + 2 * _HALO, W), fill, x.dtype)
        return jax.lax.dynamic_update_slice(out, x, (_HALO, 0))

    return [padded(x, f) for x, f in arrays]


def mg_pre_sweeps_residual(
    op, p: Array, b: Array, n_sweeps: int, omega: float,
    tile: int = 256, interpret: bool = False,
) -> tuple[Array, Array]:
    """``n_sweeps`` RB sweeps then the smoothed residual, one HBM pass.

    Returns (p', (b - A p')*fluid); bitwise-comparable to `_rb_sweep` xN
    followed by `(b - apply_A(p))*fluid` up to f32 reassociation (validated
    in tests/test_pallas_mg.py, interpret mode).
    """
    if not 1 <= n_sweeps <= 8:
        raise ValueError("n_sweeps must be in [1, 8]")
    n0, n1 = p.shape
    T = min(tile, _round_up(n0, 8))
    NP = _round_up(n0, T)
    W = _round_up(n1, 128)
    p_pad, b_pad, d_pad, c_pad = _mg_pad_planes(
        [(p, 0.0), (b, 0.0), (op.diag, 1.0), (op.code, 0)], NP, W
    )
    kern = functools.partial(
        _mg_pre_kernel,
        T=T, W=W, n_sweeps=n_sweeps, omega=omega, w0=op.w[0], w1=op.w[1],
    )
    outp, outr = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((NP, W), jnp.float32)] * 2,
        grid=(NP // T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p_pad, b_pad, d_pad, c_pad)
    return outp[:n0, :n1], outr[:n0, :n1]


def mg_add_post_sweeps(
    op, p: Array, b: Array, e: Array, n_sweeps: int, omega: float,
    tile: int = 256, interpret: bool = False,
) -> tuple[Array, Array]:
    """(p + e)*fluid, ``n_sweeps`` RB sweeps, convergence-residual partials.

    Returns (p', sum((b - A p')^2 * fluid)); the scalar makes the V-cycle
    loop's `residual_norm` check free (sqrt + 1/bnorm stay in XLA). Per-
    stripe f32 partial sums -- tolerance-level agreement with the jnp
    reduction, not bitwise.
    """
    if not 1 <= n_sweeps <= 8:
        raise ValueError("n_sweeps must be in [1, 8]")
    n0, n1 = p.shape
    T = min(tile, _round_up(n0, 8))
    NP = _round_up(n0, T)
    W = _round_up(n1, 128)
    p_pad, b_pad, d_pad, c_pad, e_pad = _mg_pad_planes(
        [(p, 0.0), (b, 0.0), (op.diag, 1.0), (op.code, 0), (e, 0.0)],
        NP, W,
    )
    kern = functools.partial(
        _mg_post_kernel,
        T=T, W=W, n_sweeps=n_sweeps, omega=omega, w0=op.w[0], w1=op.w[1],
    )
    G = NP // T
    outp, rsq = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((NP, W), jnp.float32),
            jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        ],
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.uint8),
            pltpu.VMEM((T + 2 * _HALO, W), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p_pad, b_pad, d_pad, c_pad, e_pad)
    return outp[:n0, :n1], jnp.sum(rsq.reshape(G, 8, 128)[:, 0, 0])


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


# ---------------------------------------------------------------------------
# Fused whole-step kernels (v3): predictor + BC application + Poisson RHS in
# ONE pass over the velocity field, and correction + BC preservation + step
# diagnostics in another.
#
# Motivation (measured on v5e at 256^3, isolated jit timings): the v2 path
# spent ~5.7 ms on the predictor (of which ~4 ms was building the canonical
# pre-padded operands and slicing the outputs) plus ~2.1 ms BC pass, ~2.2 ms
# divergence, ~3.2 ms correction and ~2.6 ms diagnostics -- every one of
# them a full sweep over the ~200 MB state that should cost ~0.25 ms at HBM
# speed of light.
#
# Design:
#   * ONE kernel computes u*_0, u*_1, u*_2 AND rhs = (rho/dt) div(u*): each
#     velocity component is read from HBM once per stripe (3 reads total
#     instead of v2's 9), and the divergence consumes the in-register u*.
#   * NO canonical pre-padding: inputs are the raw face arrays, padded by a
#     single cheap jnp.pad each (1-plane apron on axis 0 + tile alignment).
#     ALL ghost values -- axis-0 rows, axis-1 sublanes, axis-2 lanes -- are
#     synthesized in-kernel as `ghost = alpha*edge + beta` selects (wall/
#     inflow reflection, slip/outflow copy), extending the v2 lane trick to
#     every axis. Component 2's duplicate boundary face (lane n2) stays
#     elided everywhere, including across the step (see solver.py), so no
#     operand ever pays lane-dim padding.
#   * BCs are applied IN-KERNEL to the boundary faces of u* (Dirichlet value
#     or outflow copy), so the divergence epilogue sees BC-correct faces and
#     the separate BC pass disappears. Invariant required of the INPUT state:
#     its boundary faces already carry BC values (initial_state and the
#     corrector kernel below both guarantee it).
#   * The corrector kernel applies u = u* - scale*grad(p) on interior faces,
#     preserves boundary faces from u*, and folds the step diagnostics
#     (max |div u|, max |u_a|/h_a) into per-stripe partial maxima -- the two
#     full-field diagnostic sweeps become one tiny (G, 8, 128) reduction.
#
# Gating (fused_step3d_applicable): 3D float32, no periodic axes, no
# obstacle masks, no forcing, scalar BC values on every face, and the tile
# must divide n0 (satisfied by all power-of-two grids; tile shrinks to
# gcd(tile, n0) automatically).
# ---------------------------------------------------------------------------


def _scalar_bcs_all_axes(bcs: BCTable, ndim: int = 3,
                         allow_traced: bool = False) -> bool:
    from ..bcs import BCKind

    for ax in range(ndim):
        for side in (0, 1):
            if bcs[(ax, side)].kind is BCKind.CONVECTIVE:
                # supported ONLY at (0, 1): the once-per-step transport
                # update + Dirichlet-ghost correction are one-plane
                # post-kernel fixups (same shape as the outflow fixup)
                if (ax, side) != (0, 1):
                    return False
    for ax in range(ndim):
        for side in (0, 1):
            if bcs[(ax, side)].kind is BCKind.CONVECTIVE:
                # velocity slot holds the phase speed, not a BC value; the
                # kernels bake it as a compile-time float (_own_face_spec),
                # so a TRACED phase speed (time-dependent callable) must
                # keep the run on the jnp step even when allow_traced
                # admits traced Dirichlet values.
                vel = bcs[(ax, side)].velocity
                if vel:
                    try:
                        float(vel[0])
                    except Exception:
                        return False
                continue
            for c in range(ndim):
                if _scalar_bc(bcs, (ax, side), c, ndim,
                              allow_traced=allow_traced) is None:
                    return False
    return True


def fused_step3d_applicable(grid: GridSpec, bcs: BCTable,
                            allow_traced: bool = False) -> bool:
    """``allow_traced``: admit TRACED scalar BC values (a time-dependent
    run's per-step resolved Dirichlet values) -- the wrappers hoist them
    into the kernels' SMEM scalar vector. Default False: every caller
    that bakes values as compile-time floats keeps its old gate."""
    from ..bcs import BCKind, periodic_axes

    if grid.ndim != 3 or grid.dtype != jnp.float32:
        return False
    # VMEM budget: plane footprints up to 128K elements run double-buffered
    # input windows; larger planes single-buffer them (_db_for_plane).
    # The single-buffer scratch estimate (~100 MB at 512^2 planes) was
    # optimistic: measured on v5e, the predictor kernel at 520x512 planes
    # needs 211.65M of vmem (114M of it register-allocator SPILL slots --
    # the kernel body is too wide at that plane size), vs the 128M budget.
    # So the whole-step gate stays at 128K elements; larger planes fall
    # back to the per-component predictor kernels (adaptive tile) + jnp
    # step (512^3: 1177 MLUPS through that path).
    n1, n2 = grid.shape[1], grid.shape[2]
    if _round_up(n1 + 1, 8) * _round_up(n2, 128) > 288 * 1024:
        # Round 3 lifted the old 128K gate: planes up to ~288K elements
        # (512-wide: 520x512 = 266K) run with NARROW stripes (tile=4) and
        # single-buffered windows -- the register-spill blowup that sank
        # the 211M-vmem tile=8 attempt scales with the stripe height, and
        # tile=4/db=False fits (measured on v5e at 512^3: 72.5 ms/step =
        # 1852 MLUPS vs 1202 on the per-component fallback; tile=2 ties).
        # See fused_tile_db.
        return False
    # Periodic axes are supported in-kernel: axes 1/2 by wrap reads
    # (_shift_wrap: plain rolls when the tile padding vanishes, patched
    # rolls otherwise), axis 0 by the halo-mode lo-ghost slot (row RP-1,
    # refreshed per step from row n0-1) + refreshed hi-ghost data rows and
    # a one-plane post-kernel dup/rhs fixup in the predictor wrapper.
    # An axis-0 HI outflow face's cross-stripe zero-gradient copy is
    # patched by a one-plane post-kernel fixup (see
    # predictor_rhs_3d_internal / correct_diag_3d_internal); a LO-side
    # outflow would additionally flip the stripe-0 ghost synthesis and has
    # no case driving it -- keep it gated.
    if bcs[(0, 0)].kind is BCKind.OUTFLOW:
        return False
    return _scalar_bcs_all_axes(bcs, allow_traced=allow_traced)


def fused_tile_db(grid: GridSpec):
    """(tile, db) for the whole-step kernels on this grid. Planes above
    128K elements use tile=4: the kernel body's live-register footprint
    scales with stripe_rows x plane, so narrow stripes are what fit
    512-wide planes in VMEM (see the gate note in
    fused_step3d_applicable). With the narrow body the double-buffered
    windows fit too and buy the DMA/compute overlap back (measured at
    512^3: 66.5 ms/step db=True vs 72.5 db=False standalone)."""
    n1, n2 = grid.shape[1], grid.shape[2]
    plane = _round_up(n1 + 1, 8) * _round_up(n2, 128)
    if plane <= 128 * 1024:
        return 8, None
    return 4, True


def _tangential_ghost(bcs: BCTable, c: int, ax: int, side: int):
    """(alpha, beta) with ghost = alpha*edge + beta for component c's ghost
    beyond the (ax, side) face: wall/inflow reflection through the Dirichlet
    value, slip/outflow edge copy (matches bcs.pad_transverse). beta may be
    a TRACED scalar (time-dependent BC values resolved inside jit) -- the
    fused-step wrappers hoist it into the SMEM scalar vector."""
    from ..bcs import BCKind

    bc = bcs[(ax, side)]
    if bc.kind in (BCKind.WALL, BCKind.INFLOW):
        v = _scalar_bc(bcs, (ax, side), c, 3, allow_traced=True)
        if isinstance(v, (int, float)):
            return (-1.0, 2.0 * v)
        # TRACED value: defer the 2x reflection factor to marker-resolve
        # time so _hoist_tables can dedupe on the RAW resolved scalar --
        # one SMEM slot per distinct BC value, not one per derived 2*v
        # tracer per (component, axis, side).
        return (-1.0, ("x2", v))
    return (1.0, 0.0)


def _own_face_spec(bcs: BCTable, a: int, side: int):
    """Boundary-face value of component a on its own axis: ('d', v) for
    Dirichlet (wall/inflow/slip), ('copy',) for outflow (zero-gradient copy
    of the adjacent inner face) -- matches bcs.apply_velocity_bcs. The
    Dirichlet value may be TRACED (see _tangential_ghost); the convective
    phase speed stays a compile-time float."""
    from ..bcs import BCKind

    bc = bcs[(a, side)]
    if bc.kind is BCKind.OUTFLOW:
        return ("copy",)
    if bc.kind is BCKind.PERIODIC:
        return ("wrap",)
    if bc.kind is BCKind.CONVECTIVE:
        return ("conv", float(bc.velocity[0]) if bc.velocity else 1.0)
    return ("d", _scalar_bc(bcs, (a, side), a, 3, allow_traced=True))


def _ax_iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _shift_fix(x, axis: int, sh: int, fix):
    """Neighbor at index k+sh along ``axis`` via roll; ``fix=(edge, alpha,
    beta)`` replaces the wrapped edge position with ``alpha*x + beta``
    (ghost synthesis; None leaves wrap garbage that only ever reaches
    discarded boundary/pad outputs)."""
    r = jnp.roll(x, -sh, axis=axis)
    if fix is None:
        return r
    edge, alpha, beta = fix
    return jnp.where(_ax_iota(x.shape, axis) == edge, alpha * x + beta, r)


def _shift_wrap(x, axis: int, sh: int, n: int):
    """Periodic neighbor at index (k+sh) mod ``n`` along ``axis`` for an
    array whose VALID extent there is ``n`` (tile padding beyond). When the
    padded size equals ``n`` a plain roll IS the wrap (production shapes:
    n2 % 128 == 0, n1 % 8 == 0); otherwise the vacated edge position is
    patched with the true wrap value via a second roll (|sh| == 1 only).
    Positions >= n keep roll garbage -- they only feed masked/overwritten
    outputs."""
    r = jnp.roll(x, -sh, axis=axis)
    if x.shape[axis] == n:
        return r
    assert sh in (-1, 1), sh
    if sh == 1:
        # position n-1 <- x[0]
        return jnp.where(
            _ax_iota(x.shape, axis) == n - 1,
            jnp.roll(x, n - 1, axis=axis), r,
        )
    # position 0 <- x[n-1]
    return jnp.where(
        _ax_iota(x.shape, axis) == 0, jnp.roll(x, 1 - n, axis=axis), r
    )


def _db_for_plane(s: int, lanes: int) -> bool:
    """Double-buffer the fused-step input windows only while the second
    buffer fits. NOTE: the single-buffer path did NOT rescue 512-wide
    planes in the end -- measured on v5e, the predictor kernel at 520x512
    planes needs 211.65M of vmem (114M of register-allocator spill slots
    from the kernel body itself, independent of the window buffering), so
    fused_step3d_applicable gates those shapes out entirely and every
    production shape that reaches these kernels double-buffers. The
    db=False path is kept (bit-identical, tested) in case a future Mosaic
    register allocator shrinks the body footprint."""
    return s * lanes <= 128 * 1024


def _fused_tile(tile: int, n0: int) -> int:
    import math

    return math.gcd(tile, n0)


def _fused_dims(grid: GridSpec, tile: int):
    """Shared internal-layout dimensions for the fused-step kernels."""
    n0, n1, n2 = grid.shape
    T = _fused_tile(tile, n0)
    G = n0 // T + 1                 # data stripes (cover rows [0, n0+1])
    RP = (G + 1) * T                # internal rows incl. one margin stripe
    S0 = _round_up(n1, 8)
    S1 = _round_up(n1 + 1, 8)
    L = _round_up(n2, 128)
    return T, G, RP, S0, S1, L


def _ghost_tables(grid: GridSpec, bcs: BCTable):
    tg = {}
    own = {}
    for a in range(3):
        own[(a, 0)] = _own_face_spec(bcs, a, 0)
        own[(a, 1)] = _own_face_spec(bcs, a, 1)
        for ax in range(3):
            if ax == a:
                continue
            for side in (0, 1):
                tg[(a, ax, side)] = _tangential_ghost(bcs, a, ax, side)
    return tg, own


def _is_sc_marker(v) -> bool:
    return type(v) is tuple and len(v) in (2, 3) and v[0] == "sc"


def _hoist_tables(tg: dict, own: dict, parts: list):
    """Traced ghost-table values -> ``('sc', idx[, scale])`` markers,
    appending each distinct traced scalar to ``parts`` (the kernels' SMEM
    scalar vector, stacked by the caller AFTER this runs). Static float
    values pass through untouched, so static-BC configs bake exactly as
    before (bit-identical kernels). Only Dirichlet values are hoistable:
    the alpha coefficients and the convective phase speed are structural
    compile-time floats. Tangential-reflection betas arrive as
    ``('x2', raw)`` so the dedupe keys on the RAW resolved scalar (one
    slot per distinct BC value) and the 2x factor becomes the marker's
    static scale, applied at kernel resolve time."""
    seen: dict = {}

    def hv(v):
        if isinstance(v, (int, float)):
            return v
        scale = None
        if type(v) is tuple and v[0] == "x2":
            scale, v = 2.0, v[1]
        key = id(v)
        if key not in seen:
            seen[key] = len(parts)
            parts.append(jnp.asarray(v, jnp.float32))
        idx = seen[key]
        return ("sc", idx) if scale is None else ("sc", idx, scale)

    tg_k = {k: (a, hv(b)) for k, (a, b) in tg.items()}
    own_k = {k: (("d", hv(s[1])) if s[0] == "d" else s)
             for k, s in own.items()}
    return tg_k, own_k


def _resolve_tables(tg, own, sc_ref):
    """Kernel-body inverse of :func:`_hoist_tables`: ``('sc', i)``
    markers become SMEM scalar reads (traced per-step BC values) times
    the marker's optional static scale; floats pass through. Runs once
    at trace time at the top of each fused kernel body."""
    def rs(v):
        if not _is_sc_marker(v):
            return v
        r = sc_ref[v[1]]
        return v[2] * r if len(v) == 3 else r

    tg_r = ({k: (a, rs(b)) for k, (a, b) in tg.items()}
            if tg is not None else None)
    own_r = ({k: (("d", rs(s[1])) if s[0] == "d" else s)
              for k, s in own.items()}
             if own is not None else None)
    return tg_r, own_r


def theta_ghost_table(scfg, ndim: int = 3):
    """Scalar-BC ghost coefficients per (axis, side): ``("a", alpha,
    beta)`` with ghost = alpha*edge + beta (Dirichlet reflection /
    Neumann copy), or ``("wrap",)`` for periodic. None when any value is
    non-scalar (gates the fused thermal path)."""
    from ..scalar import ScalarBCKind

    out = {}
    for a in range(ndim):
        for s in (0, 1):
            bc = scfg.bcs[(a, s)]
            if bc.kind is ScalarBCKind.PERIODIC:
                out[(a, s)] = ("wrap",)
            elif bc.kind is ScalarBCKind.NEUMANN:
                out[(a, s)] = ("a", 1.0, 0.0)
            else:
                v = bc.value
                if not (np.isscalar(v) or getattr(v, "ndim", 1) == 0):
                    return None
                out[(a, s)] = ("a", -1.0, 2.0 * float(v))
    return out


def refresh_theta_axis0_ghosts(theta: Array, thg, n0: int, RP: int) -> Array:
    """Per-step axis-0 theta ghost rows in the carried internal layout
    (2D and 3D): row n0 = hi ghost (wrap row 0, or alpha*edge + beta from
    the scalar-BC table), row RP-1 = lo ghost (global cell -1)."""
    upd = jax.lax.dynamic_update_slice_in_dim
    if thg[(0, 1)][0] == "wrap":
        hi_row = theta[0:1]
    else:
        hi_row = thg[(0, 1)][1] * theta[n0 - 1:n0] + thg[(0, 1)][2]
    if thg[(0, 0)][0] == "wrap":
        lo_row = theta[n0 - 1:n0]
    else:
        lo_row = thg[(0, 0)][1] * theta[0:1] + thg[(0, 0)][2]
    theta = upd(theta, hi_row, n0, axis=0)
    return upd(theta, lo_row, RP - 1, axis=0)


def refresh_dirichlet_faces_internal_3d(grid: GridSpec, bcs: BCTable, iu,
                                        face_masks=None):
    """Re-impose the own-axis Dirichlet boundary-face values on the
    INTERNAL carried layout (the timedep fused scan's entry pass: the
    carried faces hold the previous step's values; tangential ghosts are
    synthesized in-kernel from the current hoisted tables, so only the
    stored face planes need refreshing). Pad regions stay identically
    zero (the scan-carry invariant); ``face_masks`` (exact-layout, may be
    traced) re-zero obstacle-closed boundary faces exactly like
    bcs.apply_velocity_bcs. Values may be traced scalars."""
    n0, n1, n2 = grid.shape
    iu0, iu1, iu2 = iu
    upd = jax.lax.dynamic_update_slice_in_dim

    def dval(a, side):
        spec = _own_face_spec(bcs, a, side)
        if spec[0] != "d":
            return None
        # STATIC (plain-float) Dirichlet values need no refresh: the
        # carried faces already hold them (predictor in-kernel BC writes
        # + corrector preservation). Only per-step-resolved values --
        # tracers inside the scan -- can differ from the carry. This
        # makes the refresh FREE for tangential time dependence
        # (oscillating lids: the moving value is ghost-only, no stored
        # plane changes) and one plane-write per genuinely time-dependent
        # normal value (pulsatile inflows). Measured on v5e at
        # 256x128x128: unconditional 5-plane refresh cost 0.67 ms/step
        # against a 1.80 ms/step fused step.
        if isinstance(spec[1], (int, float)):
            return None
        return spec[1]

    def plane(arr, axis, pos, a, valid_axes, side):
        shape = list(arr.shape)
        shape[axis] = 1
        shape = tuple(shape)
        vx, vy = valid_axes
        valid = ((_ax_iota(shape, vx[0]) < vx[1])
                 & (_ax_iota(shape, vy[0]) < vy[1]))
        v = dval(a, side)
        p = jnp.where(valid, jnp.asarray(v, arr.dtype), 0.0)
        if face_masks is not None:
            fm = jnp.take(face_masks[a], pos, axis=axis)
            fm = jnp.expand_dims(fm, axis)
            pads = [(0, shape[d] - fm.shape[d]) for d in range(3)]
            p = p * jnp.pad(fm, pads).astype(arr.dtype)
        return p

    for side, row in ((0, 0), (1, n0)):
        if dval(0, side) is not None:
            iu0 = upd(iu0, plane(iu0, 0, row, 0, ((1, n1), (2, n2)), side),
                      row, axis=0)
    for side, col in ((0, 0), (1, n1)):
        if dval(1, side) is not None:
            iu1 = upd(iu1, plane(iu1, 1, col, 1, ((0, n0), (2, n2)), side),
                      col, axis=1)
    if dval(2, 0) is not None:
        iu2 = upd(iu2, plane(iu2, 2, 0, 2, ((0, n0), (1, n1)), 0),
                  0, axis=2)
    # comp 2's hi boundary face is lane-elided (reconstructed from the
    # current spec by from_internal_3d / the kernels) -- nothing stored.
    return iu0, iu1, iu2


def vel_inv_internal_3d(grid: GridSpec, bcs: BCTable, iu, face_masks=None):
    """max_a max|u_a| / h_a over the INTERNAL carried layout -- equal to
    solver._vel_inv on the exact arrays: pad regions are identically zero
    (corrector invariant) and the periodic ghost slots duplicate valid
    rows, so whole-array maxes are exact; comp 2's lane-elided hi
    boundary face contributes its Dirichlet value explicitly ('copy' /
    'wrap' faces duplicate stored values already counted). When
    ``face_masks`` (exact layout) is given, the explicit contribution is
    scaled by that face plane's max mask bit -- an obstacle closing the
    whole hi-z boundary face zeroes its velocities on the jnp route
    (apply_velocity_bcs multiplies by face_masks), and a partially open
    face holds the full Dirichlet value somewhere, so the plane max
    reproduces the jnp post-BC field's max exactly."""
    h = grid.spacing
    inv = jnp.asarray(1e-12, iu[0].dtype)
    for a in range(3):
        inv = jnp.maximum(inv, jnp.max(jnp.abs(iu[a])) / h[a])
    spec = _own_face_spec(bcs, 2, 1)
    if spec[0] == "d":
        contrib = jnp.abs(jnp.asarray(spec[1], iu[2].dtype))
        if face_masks is not None:
            contrib = contrib * jnp.max(
                face_masks[2][:, :, -1].astype(iu[2].dtype)
            )
        inv = jnp.maximum(inv, contrib / h[2])
    return inv


def pad_theta_3d(grid: GridSpec, theta: Array, tile: int = 8) -> Array:
    """Cell-centered scalar -> the fused-step internal layout (rows pad to
    RP; the axis-0 ghost rows are refreshed per step by the corrector
    wrapper: row n0 = hi ghost, row RP-1 = lo ghost)."""
    n0, n1, n2 = grid.shape
    T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    return jnp.pad(theta, [(0, RP - n0), (0, S0 - n1), (0, L - n2)])


def to_internal_3d(grid: GridSpec, u, tile: int = 8):
    """Exact face arrays -> the fused-step internal layout: row r <-> global
    row r, sublane j <-> index j, component 2 lane-elided, hi-side zero
    padding to (G+1)*T rows / tile-aligned sublanes/lanes. All-append pads
    (no layout shift); called once per scan, not per step."""
    n0, n1, n2 = grid.shape
    T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    u0, u1, u2 = u
    if u2.shape[2] == n2 + 1:
        u2 = u2[:, :, :n2]
    return (
        jnp.pad(u0, [(0, RP - (n0 + 1)), (0, S0 - n1), (0, L - n2)]),
        jnp.pad(u1, [(0, RP - n0), (0, S1 - (n1 + 1)), (0, L - n2)]),
        jnp.pad(u2, [(0, RP - n0), (0, S0 - n1), (0, L - n2)]),
    )


def forcing_to_internal_3d(grid: GridSpec, bcs: BCTable, fields,
                           tile: int = 8):
    """Per-face forcing volumes in the jnp predictor's convention (interior
    faces along each component's own axis; all n distinct faces when that
    axis is periodic -- see stencils.predictor / les.sgs_forcing) -> the
    fused-step internal layout. Boundary faces get zeros (the kernel's BC
    writes overwrite them anyway); a periodic own axis keeps face 0's value
    and lets the kernel's duplicate-face mirroring handle face n. ``None``
    components (unforced) become zero volumes."""
    from ..bcs import periodic_axes

    per = periodic_axes(grid, bcs)
    full = []
    for a, f in enumerate(fields):
        if f is None:
            shp = list(grid.shape)
            if not per[a]:
                shp[a] -= 1
            f = jnp.zeros(tuple(shp), grid.dtype)
        if per[a]:
            idx = [slice(None)] * 3
            idx[a] = slice(0, 1)
            full.append(jnp.concatenate([f, f[tuple(idx)]], axis=a))
        else:
            pad = [(0, 0)] * 3
            pad[a] = (1, 1)
            full.append(jnp.pad(f, pad))
    return to_internal_3d(grid, tuple(full), tile)


# Obstacle face-code bits (3D port of ops/pallas_2d's uint8 codes): one
# byte per staggered face, streamed alongside the velocity windows.
FACE_OPEN_3D = 1    # face not blocked by a solid cell
CORR_OK_3D = 2      # pressure-gradient correction applied on this face


def _code_sublanes(grid: GridSpec) -> int:
    # uint8 VMEM tiles are (32, 128): pad the sublane (axis-1) extent of
    # the code volumes to 32 so windows/scratch stay tile-aligned
    return _round_up(grid.shape[1] + 1, 32)


def _face_code_volume(grid: GridSpec, face_masks, corr_masks, a: int):
    """Unpadded uint8 face-code volume for component ``a`` as concrete
    numpy (bit 0 = face open, bit 1 = interior fluid-fluid face): shape
    is grid.shape + e_a, except comp 2 whose hi boundary face is
    lane-elided in the internal layout."""
    n0, n1, n2 = grid.shape
    shape = [n0, n1, n2]
    if a != 2:
        shape[a] += 1            # comp 2's hi boundary face is lane-elided
    shape = tuple(shape)
    open_ = np.ones(shape, bool)
    if face_masks is not None:
        fm = np.asarray(face_masks[a], bool)
        open_ = fm[: shape[0], : shape[1], : shape[2]]
    # corr_masks cover INTERIOR faces only (bcs.correction_face_masks:
    # comp a has shape grid.shape - e_a); boundary faces are never
    # corrected (also enforced by the kernel's BC preservation)
    corr = np.zeros(shape, bool)
    idx = [slice(None)] * 3
    idx[a] = slice(1, grid.shape[a])
    if corr_masks is None:
        corr[tuple(idx)] = True
    else:
        corr[tuple(idx)] = np.asarray(corr_masks[a], bool)
    return (open_.astype(np.uint8) * FACE_OPEN_3D
            | corr.astype(np.uint8) * CORR_OK_3D)


def build_face_codes_3d(grid: GridSpec, face_masks, corr_masks,
                        tile: int = 8):
    """(c0, c1, c2) uint8 volumes in the fused-step internal layout, or
    None when there are no obstacles. Mirrors pallas_2d.build_face_codes:
    bit 0 = face open (zero the face otherwise), bit 1 = interior face
    between two fluid cells (pressure correction applied)."""
    if face_masks is None and corr_masks is None:
        return None
    T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    SC = _code_sublanes(grid)

    def pack(a):
        code = _face_code_volume(grid, face_masks, corr_masks, a)
        out = np.zeros((RP, SC, L), np.uint8)
        out[: code.shape[0], : code.shape[1], : code.shape[2]] = code
        return jnp.asarray(out)

    return pack(0), pack(1), pack(2)


def pad_fluid_code_3d(grid: GridSpec, code, tile: int = 8):
    """ops/poisson stencil code (uint8, cells) -> internal layout (the
    RHS/divergence fluid mask rides its FLUID_BIT)."""
    n0, n1, n2 = grid.shape
    T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    SC = _code_sublanes(grid)
    return jnp.pad(code, [(0, RP - n0), (0, SC - n1), (0, L - n2)])


def from_internal_3d(grid: GridSpec, bcs: BCTable, iu):
    """Internal layout -> exact face arrays (re-attaching comp 2's elided
    boundary face from its BC spec)."""
    n0, n1, n2 = grid.shape
    iu0, iu1, iu2 = iu
    u0 = iu0[: n0 + 1, :n1, :n2]
    u1 = iu1[:n0, : n1 + 1, :n2]
    u2e = iu2[:n0, :n1, :n2]
    spec = _own_face_spec(bcs, 2, 1)
    if spec[0] == "copy":
        face = u2e[:, :, n2 - 1:n2]
    elif spec[0] == "wrap":
        face = u2e[:, :, 0:1]          # periodic duplicate face n2 == face 0
    else:
        face = jnp.full((n0, n1, 1), spec[1], u2e.dtype)
    return u0, u1, u2e, face


def _fused_pred_kernel(
    sc_ref, u0_hbm, u1_hbm, u2_hbm, *rest,
    T: int, n: tuple, h: tuple, nu: float, gamma: float,
    tg: dict, own: dict, RP: int, halo: bool = False, halo1: bool = False,
    db: bool = True,
    masked: bool = False, per: tuple = (False, False, False),
    force: tuple = (0.0, 0.0, 0.0),
    buoy: tuple = (0.0, 0.0, 0.0), tref: float = 0.0,
    thermal: bool = False, based: bool = False, forced: bool = False,
):
    """One axis-0 stripe: u* for all three components (BCs applied) + the
    scaled divergence rhs, in the INTERNAL layout (v3).

    ``per``: periodic axes. Axes 1/2 wrap in-register (_shift_wrap); a
    periodic axis 0 reuses the halo-mode lo-ghost slot (input row RP-1 =
    global row n0-1, refreshed by the wrapper) and reads the hi ghosts
    from the refreshed data rows n0 (cell comps) / the carried duplicate
    face row n0 (comp 0); the dup face output and its rhs plane are
    patched post-kernel by the wrapper.

    v3 layout: input/output row r <-> global row r, sublane j <-> index j
    (no aprons) -- kernel B's outputs feed this kernel directly across scan
    steps with zero per-step repacking. Stripe i's window is rows
    [i*T - 1, i*T + T + 2) (clamped at 0); the body is emitted twice under
    pl.when -- stripe 0 maps window row w <-> global w and synthesizes the
    global row -1 ghosts in-register (roll + edge fix), interior stripes map
    w <-> i*T + w - 1 and use plain row slices. Ghost values beyond the
    other boundaries are synthesized per-read as ``alpha*edge + beta``
    rolls/selects (wall/inflow reflection, slip/outflow copy); the six MAC
    transverse averages are factored through three cell-centered pair
    averages M_t. Rows beyond n0(+1) hold finite garbage that never reaches
    a kept output; the margin stripe (i == G) zero-fills.
    """
    # Positional layout (pallas: inputs..., outputs..., scratch...), with
    # each optional volume set gated by its flag -- any combination works:
    #   inputs:  [theta] [base x3] [forcing-field x3] [code x4]
    #   outputs: out0 out1 out2 rhs
    #   scratch: s0 s1 s2 [s_th] [sb x3] [sf x3] sems sg0 sg1 sg2 gsems
    #            [code scratch x4 + csems]
    rest = list(rest)

    def _take(k):
        vals = tuple(rest[:k])
        del rest[:k]
        return vals

    th_hbm = _take(1)[0] if thermal else None
    b0_hbm, b1_hbm, b2_hbm = _take(3) if based else (None,) * 3
    f0_hbm, f1_hbm, f2_hbm = _take(3) if forced else (None,) * 3
    c0_hbm, c1_hbm, c2_hbm, fc_hbm = _take(4) if masked else (None,) * 4
    out0, out1, out2, rhs_ref = _take(4)
    s0, s1, s2 = _take(3)
    s_th = _take(1)[0] if thermal else None
    sb0, sb1, sb2 = _take(3) if based else (None,) * 3
    sf0, sf1, sf2 = _take(3) if forced else (None,) * 3
    (sems,) = _take(1)
    sg0, sg1, sg2 = _take(3)
    (gsems,) = _take(1)
    if masked:
        cs0, cs1, cs2, cfs, csems = _take(5)
    assert not rest
    i = pl.program_id(0)
    n0, n1, n2 = n
    # halo mode (sharded whole-step; parallel/fused_sharded.py): n0 is the
    # LOCAL row count B (comp 0 trimmed to B faces); rows B, B+1 of each
    # input hold jnp-refreshed hi ghosts (neighbor halo / BC synthesis) and
    # row RP-1 holds the lo ghost (global row kB-1). No in-kernel axis-0
    # ghost synthesis; boundary-face overwrites gate on the is_first /
    # is_last scalars (sc_ref[2], sc_ref[3]).
    G = n0 // T if halo else n0 // T + 1
    i_star = n0 // T - 1            # stripe whose window spans global row n0
    R3 = T + 3
    # Double-buffered input windows (db=True): each scratch holds two
    # R3-row halves; stripe i's DMA was started during stripe i-1 (prologue
    # for i=0), and stripe i starts i+1's transfer into the other half
    # BEFORE waiting, so the copy engines overlap the VPU work (~0.35
    # ms/step of serialized input DMA otherwise at 256^3). db=False
    # (large planes, e.g. 512-wide: the second buffer would blow the VMEM
    # budget) holds ONE half and serializes each stripe's transfer --
    # still one fused HBM pass, just without copy/compute overlap.
    phase = jax.lax.rem(i, 2) if db else 0
    # extra volumes ride the same windows/starts as the velocity volumes:
    # theta (buoyancy), and the rk2 base state whose center anchors
    # star = base + dt*RHS(midpoint)
    refs = (u0_hbm, u1_hbm, u2_hbm)
    scrs = [s0, s1, s2]
    if thermal:
        refs += (th_hbm,)
        scrs.append(s_th)
    if based:
        refs += (b0_hbm, b1_hbm, b2_hbm)
        scrs += [sb0, sb1, sb2]
    if forced:
        refs += (f0_hbm, f1_hbm, f2_hbm)
        scrs += [sf0, sf1, sf2]
    scrs = tuple(scrs)

    def _dma(j, ph):
        st = jnp.clip(j * T - 1, 0, RP - R3)
        cps = [
            pltpu.make_async_copy(
                ref.at[pl.ds(st, R3)],
                scr.at[pl.ds(ph * R3, R3)],
                sems.at[ph, k],
            )
            for k, (ref, scr) in enumerate(zip(refs, scrs))
        ]
        if masked:
            # code windows align to OUTPUT rows [jT, jT+T+1): masks apply
            # to kept faces only, no halo rows needed
            stc = jnp.minimum(j * T, RP - (T + 1))
            cps += [
                pltpu.make_async_copy(
                    ref.at[pl.ds(stc, T + 1)],
                    scr.at[pl.ds(ph * (T + 1), T + 1)],
                    csems.at[ph, k],
                )
                for k, (ref, scr) in enumerate(
                    zip((c0_hbm, c1_hbm, c2_hbm, fc_hbm),
                        (cs0, cs1, cs2, cfs))
                )
            ]
        return cps

    if db:
        @pl.when(i == 0)
        def _prologue():
            for cp in _dma(0, 0):
                cp.start()

        @pl.when(i < G)
        def _prefetch():
            for cp in _dma(i + 1, 1 - phase):
                cp.start()
    else:
        for cp in _dma(i, 0):
            cp.start()

    if halo or per[0]:
        gcopies = [
            pltpu.make_async_copy(
                ref.at[pl.ds(RP - 1, 1)], scr, gsems.at[k]
            )
            for k, (ref, scr) in enumerate(zip(refs, (sg0, sg1, sg2)))
        ]

        @pl.when(i == 0)
        def _lo_ghost_dma():
            for cp in gcopies:
                cp.start()
            for cp in gcopies:
                cp.wait()

    for cp in _dma(i, phase):       # same shapes -> same semaphore amount
        cp.wait()
    off = phase * R3
    dt = sc_ref[0]
    rho_over_dt = sc_ref[1]
    # traced BC values (time-dependent runs): markers -> SMEM reads
    tg, own = _resolve_tables(tg, own, sc_ref)
    if halo:
        is_first = sc_ref[2] > 0.5
        is_last = sc_ref[3] > 0.5
    if halo1:
        # pencil mode (axis 1 sharded over 'sy'): sublane ghost COLUMNS at
        # n1 (and n1+1 for the own-axis comp) / the window's last sublane
        # (lo), jnp-refreshed per step like the axis-0 ghost rows; n1 is
        # the LOCAL width m1 here. The roll-based axis-1 shifts then pick
        # the ghosts up with fix=None, and the comp-1 boundary-face writes
        # gate on these edge flags.
        is_first1 = sc_ref[4] > 0.5
        is_last1 = sc_ref[5] > 0.5
    S_RHS = rhs_ref.shape[1]

    def own2_hi_fix():
        spec = own[(2, 1)]
        if spec[0] == "copy":
            return (n2 - 1, 1.0, 0.0)
        return (n2 - 1, 0.0, spec[1])

    def body(ro: int):
        # hi-side axis-0 ghost rows for comps 1/2 (global row n0), written
        # into the scratch window once; static row index per branch.
        # (halo mode / periodic axis 0: the hi ghosts are DATA rows --
        # neighbor halos, resp. wrapper-refreshed wrap rows.)
        hi_row = n0 - i_star * T + ro
        if not (halo or per[0]) and (i_star == 0) == (ro == 0):
            def _write_hi():
                for a, scr in ((1, s1), (2, s2)):
                    ah, bh = tg[(a, 0, 1)]
                    scr[pl.ds(off + hi_row, 1)] = (
                        ah * scr[pl.ds(off + hi_row - 1, 1)] + bh
                    )
            if i_star == 0:
                _write_hi()          # branch ro=0 IS stripe i_star
            else:
                pl.when(i == i_star)(_write_hi)

        wins = [scr[pl.ds(off, R3)] for scr in (s0, s1, s2)]
        SOUT = (out0.shape[1], out1.shape[1], out2.shape[1])

        def center(a, rows):
            return wins[a][ro:ro + rows, :SOUT[a]]

        def nbr(a, ax, d, rows):
            w = wins[a]
            S = SOUT[a]
            if ax == 0:
                if ro + d >= 0:
                    return w[ro + d:ro + d + rows, :S]
                # stripe 0, d = -1: global row -1 ghost via roll + fix
                r = jnp.roll(w, 1, axis=0)[0:rows, :S]
                rows_i = _ax_iota(r.shape, 0)
                if halo or per[0]:
                    # the lo ghost row (global kB-1 / wrap row n0-1) is
                    # real data at RP-1
                    g_scr = (sg0, sg1, sg2)[a]
                    return jnp.where(rows_i == 0, g_scr[0:1, :S], r)
                if a == 0:
                    return r         # only feeds the BC-written face 0
                al, bl = tg[(a, 0, 0)]
                c = w[0:rows, :S]
                return jnp.where(rows_i == 0, al * c + bl, r)
            c = w[ro:ro + rows, :S]
            if ax == 1:
                if halo1:
                    # ghost slots make the plain roll correct everywhere:
                    # position 0 <- window's last sublane (lo ghost),
                    # position n1-1's hi neighbor <- slot n1 (hi ghost)
                    return _shift_fix(c, 1, d, None)
                if per[1]:
                    # n1 distinct faces/cells for every component (comp 1's
                    # in-array face n1 is the maintained duplicate)
                    return _shift_wrap(c, 1, d, n1)
                if a == 1:
                    return _shift_fix(c, 1, d, None)   # faces in-array
                al, bl = tg[(a, 1, 0)]
                ah, bh = tg[(a, 1, 1)]
                fix = (0, al, bl) if d < 0 else (n1 - 1, ah, bh)
                return _shift_fix(c, 1, d, fix)
            if per[2]:
                return _shift_wrap(c, 2, d, n2)
            if a == 2:
                if d < 0:
                    return _shift_fix(c, 2, d, None)
                return _shift_fix(c, 2, d, own2_hi_fix())
            al, bl = tg[(a, 2, 0)]
            ah, bh = tg[(a, 2, 1)]
            fix = (0, al, bl) if d < 0 else (n2 - 1, ah, bh)
            return _shift_fix(c, 2, d, fix)

        # cell-centered pair averages; index k <-> axis-0 position
        # i*T + k - ro (rows), sublane/lane <-> cell index directly
        M0 = 0.5 * (wins[0][0:T + 2] + wins[0][1:T + 3])
        W1 = wins[1].shape[1] - 1
        M1 = 0.5 * (wins[1][:, 0:W1] + wins[1][:, 1:1 + W1])
        hi2 = (_shift_wrap(wins[2], 2, 1, n2) if per[2]
               else _shift_fix(wins[2], 2, 1, own2_hi_fix()))
        M2 = 0.5 * (wins[2] + hi2)

        def bavg(a, t, rows):
            m = (M0, M1, M2)[t]
            S = SOUT[a]
            if m.shape[1] < S:
                # conform narrow M-fields to the consumer's sublane width
                # (pad positions only feed BC-overwritten faces)
                m = jnp.pad(m, [(0, 0), (0, S - m.shape[1]), (0, 0)])
            if a == 0:
                # faces r: cells r-1, r -> rows (o+ro-1, o+ro)
                hi = m[ro:ro + rows, :S]
                if ro == 0:
                    lo = jnp.roll(m, 1, axis=0)[0:rows, :S]  # feeds face 0
                    if halo or per[0]:
                        # M_t at cell kB-1 (wrap: n0-1) from the comp-t lo
                        # ghost row
                        if t == 1:
                            gW = sg1.shape[1] - 1
                            m_m1 = 0.5 * (sg1[0:1, 0:gW] + sg1[0:1, 1:1 + gW])
                        else:
                            g_hi = (_shift_wrap(sg2[0:1], 2, 1, n2)
                                    if per[2]
                                    else _shift_fix(sg2[0:1], 2, 1,
                                                    own2_hi_fix()))
                            m_m1 = 0.5 * (sg2[0:1] + g_hi)
                        if m_m1.shape[1] < S:
                            m_m1 = jnp.pad(
                                m_m1, [(0, 0), (0, S - m_m1.shape[1]), (0, 0)]
                            )
                        lo = jnp.where(
                            _ax_iota(lo.shape, 0) == 0, m_m1[:, :S], lo
                        )
                else:
                    lo = m[ro - 1:ro - 1 + rows, :S]
                return 0.5 * (lo + hi)
            mc = m[ro:ro + T, :S]
            if a == 1:
                # faces s: cells s-1, s (sublane shift; wrap feeds face 0)
                if per[1]:
                    return 0.5 * (_shift_wrap(mc, 1, -1, n1) + mc)
                return 0.5 * (_shift_fix(mc, 1, -1, None) + mc)
            if per[2]:
                return 0.5 * (_shift_wrap(mc, 2, -1, n2) + mc)
            return 0.5 * (_shift_fix(mc, 2, -1, None) + mc)

        stars = []
        for a in range(3):
            rows = T + 1 if a == 0 else T
            c0 = center(a, rows)
            vels = {a: c0}
            for t in range(3):
                if t != a:
                    vels[t] = bavg(a, t, rows)
            adv = None
            lap = None
            for ax in range(3):
                m = nbr(a, ax, -1, rows)
                p = nbr(a, ax, +1, rows)
                inv2h = 1.0 / (2.0 * h[ax])
                invh2 = 1.0 / (h[ax] * h[ax])
                vel = vels[ax]
                d_c = (p - m) * inv2h
                if gamma > 0.0:
                    invh = 1.0 / h[ax]
                    d_u = jnp.where(
                        vel > 0.0, (c0 - m) * invh, (p - c0) * invh
                    )
                    d = gamma * d_u + (1.0 - gamma) * d_c
                else:
                    d = d_c
                term = vel * d
                adv = term if adv is None else adv + term
                lp = (p - 2.0 * c0 + m) * invh2
                lap = lp if lap is None else lap + lp
            rhs_a = nu * lap - adv
            if force[a]:
                # static scalar body force (e.g. the channel/duct pressure
                # -gradient surrogate); boundary faces are overwritten by
                # the BC writes below, matching the jnp interior-only add
                rhs_a = rhs_a + force[a]
            if thermal and buoy[a]:
                # Boussinesq buoyancy f_a = coef * (theta_face - tref):
                # theta cell pair averaged to comp-a faces. Interior faces
                # only need in-range cells (buoyancy along a periodic axis
                # is rejected at build); boundary-face garbage is
                # BC-overwritten below.
                S = SOUT[a]
                thw = s_th[pl.ds(off, R3)]
                if thw.shape[1] < S:
                    # comp 1's face sublanes exceed theta's cell sublanes;
                    # the pad only feeds BC-overwritten faces
                    thw = jnp.pad(
                        thw, [(0, 0), (0, S - thw.shape[1]), (0, 0)]
                    )
                if a == 0:
                    th_c = thw[ro:ro + rows, :S]
                    if ro == 0:
                        th_m = jnp.roll(thw, 1, axis=0)[0:rows, :S]
                    else:
                        th_m = thw[ro - 1:ro - 1 + rows, :S]
                else:
                    th_c = thw[ro:ro + rows, :S]
                    th_m = _shift_fix(th_c, a, -1, None)
                rhs_a = rhs_a + buoy[a] * (0.5 * (th_m + th_c) - tref)
            if forced:
                # per-face forcing VOLUME (e.g. the LES subgrid-stress
                # divergence): streamed in internal layout, read at the
                # same rows as `center` -- boundary faces are overwritten
                # by the BC writes below, matching the jnp interior add
                fw = (sf0, sf1, sf2)[a][pl.ds(off, R3)]
                rhs_a = rhs_a + fw[ro:ro + rows, :SOUT[a]]
            if based:
                # rk2 stage 2: u* = u_base + dt*RHS(u_mid) -- the window
                # holds the midpoint field, the base streams separately
                bw = (sb0, sb1, sb2)[a][pl.ds(off, R3)]
                star = bw[ro:ro + rows, :SOUT[a]] + dt * rhs_a
            else:
                star = c0 + dt * rhs_a

            # in-kernel BC application to the component's boundary faces
            # (periodic own axis: face 0 is COMPUTED from wrap reads; the
            # duplicate face -- sublane n1 for comp 1, row n0 for comp 0
            # (post-kernel), elided for comp 2 -- mirrors it)
            lo, hi = own[(a, 0)], own[(a, 1)]
            if a == 0:
                if not per[0]:
                    g = _ax_iota(star.shape, 0) + i * T
                    # ("wrap",) specs only reach here in halo mode, where
                    # the ring keeps is_first/is_last False -- the value is
                    # dead, any placeholder works
                    v_lo = (jnp.roll(star, -1, axis=0)
                            if lo[0] == "copy"
                            else (0.0 if lo[0] == "wrap" else lo[1]))
                    v_hi = (jnp.roll(star, 1, axis=0)
                            if hi[0] == "copy"
                            else (0.0 if hi[0] == "wrap" else hi[1]))
                    if halo:
                        # face 0 / face B(=n0, in-register only: the
                        # divergence epilogue needs the shared/BC face
                        # value, the OUTPUT is trimmed to rows [0, B)) are
                        # boundary faces only on the edge shards
                        star = jnp.where(
                            (g == 0) & is_first, v_lo,
                            jnp.where((g == n0) & is_last, v_hi, star),
                        )
                    else:
                        star = jnp.where(
                            g == 0, v_lo, jnp.where(g == n0, v_hi, star)
                        )
            elif a == 1:
                s_i = _ax_iota(star.shape, 1)
                if halo1:
                    # faces 0 / n1(=m1, the in-register shared/BC face the
                    # divergence epilogue reads) are boundary faces only on
                    # the edge shards; "wrap" specs only reach here when
                    # the sy ring keeps both flags False -- value dead
                    v_lo = (_shift_fix(star, 1, 1, None)
                            if lo[0] == "copy"
                            else (0.0 if lo[0] == "wrap" else lo[1]))
                    v_hi = (_shift_fix(star, 1, -1, None)
                            if hi[0] == "copy"
                            else (0.0 if hi[0] == "wrap" else hi[1]))
                    star = jnp.where(
                        (s_i == 0) & is_first1, v_lo,
                        jnp.where((s_i == n1) & is_last1, v_hi, star),
                    )
                elif per[1]:
                    star = jnp.where(
                        s_i == n1, jnp.roll(star, n1, axis=1), star
                    )
                else:
                    v_lo = (_shift_fix(star, 1, 1, None)
                            if lo[0] == "copy" else lo[1])
                    v_hi = (_shift_fix(star, 1, -1, None)
                            if hi[0] == "copy" else hi[1])
                    star = jnp.where(
                        s_i == 0, v_lo, jnp.where(s_i == n1, v_hi, star)
                    )
            elif not per[2]:
                l_i = _ax_iota(star.shape, 2)
                v_lo = (_shift_fix(star, 2, 1, None)
                        if lo[0] == "copy" else lo[1])
                star = jnp.where(l_i == 0, v_lo, star)   # face n2 elided
            stars.append(star)

        if masked:
            # obstacle faces: zero closed faces AFTER the BC writes (the
            # jnp path's apply_velocity_bcs order; boundary faces stay
            # open unless solid touches the wall)
            offc = phase * (T + 1)
            cw = [scr[pl.ds(offc, T + 1)] for scr in (cs0, cs1, cs2)]
            stars[0] = jnp.where(
                (cw[0][:, :SOUT[0]] & FACE_OPEN_3D) != 0, stars[0], 0.0)
            stars[1] = jnp.where(
                (cw[1][:T, :SOUT[1]] & FACE_OPEN_3D) != 0, stars[1], 0.0)
            stars[2] = jnp.where(
                (cw[2][:T, :SOUT[2]] & FACE_OPEN_3D) != 0, stars[2], 0.0)
        out0[...] = stars[0][:T]
        out1[...] = stars[1]
        out2[...] = stars[2]

        # divergence epilogue on the BC-correct in-register u* (per[1]:
        # cell n1-1 reads the just-written duplicate face at sublane n1;
        # per[0]: the cell-n0-1 plane is recomputed post-kernel with the
        # dup face)
        d0 = (stars[0][1:T + 1] - stars[0][:T]) * (1.0 / h[0])
        d1 = (_shift_fix(stars[1], 1, 1, None) - stars[1])[:, :S_RHS] \
            * (1.0 / h[1])
        s2hi = (_shift_wrap(stars[2], 2, 1, n2) if per[2]
                else _shift_fix(stars[2], 2, 1, own2_hi_fix()))
        d2 = (s2hi - stars[2]) * (1.0 / h[2])
        rhs = (d0[:, :S_RHS] + d1 + d2[:, :S_RHS]) * rho_over_dt
        if masked:
            fw = cfs[pl.ds(phase * (T + 1), T + 1)]
            rhs = jnp.where(
                (fw[:T, :S_RHS] & (1 << 6)) != 0, rhs, 0.0
            )  # bit 6 = ops/poisson FLUID_BIT
        rhs_ref[...] = rhs

    @pl.when(i == 0)
    def _stripe0():
        body(0)

    @pl.when(jnp.logical_and(i > 0, i < G))
    def _interior():
        body(1)

    @pl.when(i == G)
    def _margin():
        out0[...] = jnp.zeros(out0.shape, out0.dtype)
        out1[...] = jnp.zeros(out1.shape, out1.dtype)
        out2[...] = jnp.zeros(out2.shape, out2.dtype)
        rhs_ref[...] = jnp.zeros(rhs_ref.shape, rhs_ref.dtype)


def _halo_dims(grid: GridSpec, tile: int):
    """Internal-layout dims for the SHARDED (halo-mode) fused step: local
    block of B=n0 rows, G data stripes + 1 margin, hi ghosts at rows B/B+1
    inside the margin, lo ghost at row RP-1."""
    n0, n1, n2 = grid.shape
    T = _fused_tile(tile, n0)
    return T, n0 // T, n0 + T, _round_up(n1, 8), _round_up(n1 + 1, 8), \
        _round_up(n2, 128)


def _halo_dims_pencil(grid: GridSpec, tile: int):
    """Dims for the PENCIL ('sx','sy') sharded fused step: axis-0 halo
    rows as in _halo_dims, plus axis-1 ghost COLUMNS -- every component
    carries m1 data sublanes (comp 1 trimmed to m1 faces like comp 0's
    rows), hi ghost slots at sublanes m1/m1+1 and the lo ghost at the
    window's last sublane SH-1, so the kernel's roll-based axis-1 shifts
    pick them up with no edge fixes."""
    n0, m1, n2 = grid.shape
    T = _fused_tile(tile, n0)
    SH = _round_up(m1 + 3, 8)
    return T, n0 // T, n0 + T, SH, SH, _round_up(n2, 128)


def predictor_rhs_3d_internal(
    grid: GridSpec,
    bcs: BCTable,
    iu,
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    rho: float = 1.0,
    tile: int = 8,
    interpret: bool = False,
    halo: bool = False,
    edge_flags=None,
    halo1: bool = False,
    edge_flags1=None,
    db: Optional[bool] = None,
    face_codes=None,
    fluid_code=None,
    forcing=None,
    theta=None,
    buoyancy=None,
    theta_ref: float = 0.0,
    base=None,
    forcing_fields=None,
):
    """Fused u* + Poisson-RHS kernel over internal-layout inputs; returns
    internal-layout u* and the exact-shaped rhs.

    ``forcing_fields``: optional per-FACE forcing volumes (one internal-
    layout array per component -- e.g. the LES subgrid-stress divergence,
    or any spatially varying body force), streamed alongside the velocity
    windows and added to the predictor RHS at every kept face.

    ``base``: rk2 stage-2 mode -- ``iu`` is the MIDPOINT field whose
    advection-diffusion RHS advances the separately streamed ``base``
    state: u* = base + dt*RHS(iu).

    ``forcing``: optional per-component STATIC scalar body force (the
    channel/duct constant pressure-gradient surrogate). ``theta`` +
    ``buoyancy`` (static per-axis coefficients) fuse the Boussinesq
    forcing in-kernel: theta (internal layout) streams alongside the
    velocity windows and the face-averaged deviation from ``theta_ref``
    adds to the predictor RHS.

    ``halo=True`` (parallel/fused_sharded.py): ``grid`` is the LOCAL block,
    ``iu`` the halo-mode layout (ghost slots filled), ``edge_flags`` the
    (is_first, is_last) traced 0/1 scalars. ``db`` selects double-buffered
    input windows (None = auto by plane footprint; see
    :func:`_db_for_plane`). ``face_codes``/``fluid_code``
    (build_face_codes_3d / pad_fluid_code_3d) enable obstacle masking.
    An axis-0 HI outflow face is handled by a post-kernel one-plane fixup
    (the in-stripe copy cannot reach the previous stripe's row)."""
    from ..bcs import periodic_axes

    n0, n1, n2 = grid.shape
    h = tuple(float(x) for x in grid.spacing)
    if halo1:
        assert halo, "pencil mode layers on the axis-0 halo machinery"
        T, G, RP, S0, S1, L = _halo_dims_pencil(grid, tile)
    elif halo:
        T, G, RP, S0, S1, L = _halo_dims(grid, tile)
    else:
        T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    if db is None:
        db = _db_for_plane(S1, L)
    nb = 2 if db else 1
    masked = face_codes is not None
    per = tuple(periodic_axes(grid, bcs))
    if halo:
        # sharded periodic axis 0 is handled OUTSIDE the kernel by the
        # wraparound ppermute ghost rings (parallel/fused_sharded.py) with
        # first=last=False edge flags; in-kernel axis-0 stays halo-mode
        per = (False,) + per[1:]
    if halo1:
        # same deal along axis 1: the sy ring closes periodic wraps.
        # Obstacles compose: the static per-shard code blocks carry the
        # comp-1 shared-face COLUMN m1 (and comp-0 shared row b) prefilled
        # at build time (fused_sharded.build_face_codes_pencil), so the
        # in-register shared-face stars gate on the true global codes.
        per = (per[0], False, per[2])
    assert not (masked and any(per)), "obstacles + periodic not supported"

    if per[0]:
        # refresh the axis-0 wrap ghost rows in the carried input layout:
        # hi ghost row n0 := row 0 (cell-centered comps; comp 0's row n0 is
        # the carried duplicate face), lo ghost row RP-1 := row n0-1.
        # Plane-sized updates -- XLA updates the dead carry in place.
        upd = jax.lax.dynamic_update_slice_in_dim
        iu0, iu1, iu2 = iu
        iu1 = upd(iu1, iu1[0:1], n0, axis=0)
        iu2 = upd(iu2, iu2[0:1], n0, axis=0)
        iu0 = upd(iu0, iu0[n0 - 1:n0], RP - 1, axis=0)
        iu1 = upd(iu1, iu1[n0 - 1:n0], RP - 1, axis=0)
        iu2 = upd(iu2, iu2[n0 - 1:n0], RP - 1, axis=0)
        iu = (iu0, iu1, iu2)

    tg, own = _ghost_tables(grid, bcs)
    rho_over_dt = jnp.asarray(rho, jnp.float32) / jnp.asarray(dt, jnp.float32)
    parts = [jnp.asarray(dt, jnp.float32), rho_over_dt]
    if halo:
        parts += [jnp.asarray(f, jnp.float32) for f in edge_flags]
    if halo1:
        parts += [jnp.asarray(f, jnp.float32) for f in edge_flags1]
    # Time-dependent BC VALUES: traced table entries ride the SMEM scalar
    # vector (appended after the fixed slots, so the kernel's static
    # sc_ref[0..5] reads are unmoved); the kernel body reads them back
    # via _resolve_tables. Static configs hoist nothing -- tg_k/own_k are
    # the plain float tables and the kernels bake exactly as before.
    tg_k, own_k = _hoist_tables(tg, own, parts)
    sc = jnp.stack(parts)
    force = (0.0, 0.0, 0.0)
    if forcing is not None:
        force = tuple(
            0.0 if f is None else float(f) for f in forcing
        )
    buoy = (0.0, 0.0, 0.0)
    if buoyancy is not None:
        buoy = tuple(float(b) for b in buoyancy)
    thermal = theta is not None and any(buoy)
    based = base is not None
    forced = forcing_fields is not None
    # thermal + masked composes (round 4, VERDICT r3 item 4): the buoyancy
    # face-average adds to rhs_a BEFORE the code gating zeroes closed
    # faces, matching the jnp order (buoyancy_forcing at all interior
    # faces, then apply_velocity_bcs(face_masks)). Solid-cell theta is the
    # wrapper-clamped body value (isothermal) or the freely diffusing
    # solid field (adiabatic) -- identical to what the jnp predictor reads.
    # based + masked composes: the codes gate the ASSEMBLED star
    # (u* = base + dt*RHS(mid)) after the BC writes and mask the rhs by
    # the fluid bit -- exactly the per-stage order of the jnp rk2 branch
    # (_predict ends with apply_velocity_bcs(face_masks); _project masks
    # the divergence by op.fluid).
    # forced + halo composes: the per-shard forcing blocks are packed once
    # at build time (fused_sharded.forcing_to_halo / forcing_to_pencil)
    # with comp 0's shared-face row b prefilled (the comp-0 read spans
    # T+1 rows, so the last data stripe's in-register shared-face star
    # needs it) and, in pencil mode, comp 1's shared-face column m1.
    if thermal and halo:
        # sharded thermal: theta's axis-0 ghosts are NOT streamed -- only
        # buoyancy transverse to the sharded axis needs no axis-0 cells
        assert buoy[0] == 0.0, \
            "sharded fused buoyancy along the sharded axis not supported"
    # based + halo composes: the base volumes stream through the same
    # stripe windows as ``iu``, so as long as the caller refreshes base's
    # ghost slots with the SAME ppermute/BC exchange as the midpoint field
    # (parallel/fused_sharded._refresh_ghosts), the in-register shared-face
    # star (window row B) anchors at the true neighbor base face.
    if halo1 and thermal:
        assert buoy[1] == 0.0, \
            "pencil fused buoyancy along the sy-sharded axis not supported"
    kern = functools.partial(
        _fused_pred_kernel,
        T=T, n=(n0, n1, n2), h=h, nu=nu, gamma=upwind_gamma,
        tg=tg_k, own=own_k, RP=RP, halo=halo, halo1=halo1, db=db,
        masked=masked, per=per,
        force=force, buoy=buoy, tref=float(theta_ref), thermal=thermal,
        based=based, forced=forced,
    )
    win = [
        pltpu.VMEM((nb * (T + 3), S0, L), jnp.float32),
        pltpu.VMEM((nb * (T + 3), S1, L), jnp.float32),
        pltpu.VMEM((nb * (T + 3), S0, L), jnp.float32),
    ]
    scratch = list(win)
    if thermal:
        scratch.append(pltpu.VMEM((nb * (T + 3), S0, L), jnp.float32))
    if based:
        scratch += list(win)
    if forced:
        scratch += list(win)
    n_vols = 3 + (1 if thermal else 0) + (3 if based else 0) \
        + (3 if forced else 0)
    scratch += [
        pltpu.SemaphoreType.DMA((2, n_vols)),
        pltpu.VMEM((1, S0, L), jnp.float32),
        pltpu.VMEM((1, S1, L), jnp.float32),
        pltpu.VMEM((1, S0, L), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    args = (sc, iu[0], iu[1], iu[2])
    if thermal:
        args += (theta,)
    if based:
        args += (base[0], base[1], base[2])
    if forced:
        args += tuple(forcing_fields)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * n_vols
    if masked:
        # pencil (halo1): the star arrays carry SH(=S0) sublanes incl.
        # ghost columns, and the zeroing slices cw[a][:, :SOUT[a]] -- the
        # code blocks must cover them (round_up(S0, 32) >= S0 always;
        # _code_sublanes(local) can fall short when m1 % 32 in {30, 31})
        SC = _round_up(S0, 32) if halo1 else _code_sublanes(grid)
        args += (face_codes[0], face_codes[1], face_codes[2], fluid_code)
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 4
        scratch += [
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    out0, out1, out2, rhs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((RP, S0, L), jnp.float32),
            jax.ShapeDtypeStruct((RP, S1, L), jnp.float32),
            jax.ShapeDtypeStruct((RP, S0, L), jnp.float32),
            jax.ShapeDtypeStruct((RP, S0, L), jnp.float32),
        ],
        grid=(G + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((T, S0, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S0, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S0, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    rhs = rhs[:n0, :n1, :n2]
    hi0 = own[(0, 1)][0]
    if not halo and (hi0 in ("copy", "conv") or per[0]):
        # axis-0 HI outflow / convective / periodic: the face-n0 value
        # (zero-gradient copy of face n0-1, the convective transport
        # update, resp. the wrap duplicate of face 0) crosses a stripe
        # boundary, so it and the rhs plane it feeds are patched here --
        # one plane of work per step. For outflow, d0 at cell row n0-1 is
        # exactly zero after the copy; otherwise it is
        # (face_n0 - u*[n0-1]) / h0.
        inner = jax.lax.dynamic_slice_in_dim(out0, n0 - 1, 1, axis=0)
        if per[0]:
            plane = jax.lax.dynamic_slice_in_dim(out0, 0, 1, axis=0)
        elif hi0 == "conv":
            # u_b^{n+1} = u_b^n - C (u_b^n - u*_inner), C = U dt/h in [0,1]
            # -- anchored at the STEP-START face: rk2's based stage 2
            # streams the midpoint in ``iu``, so the held face comes from
            # ``base`` there (the jnp path's apply_convective_outlets
            # always reads state.u)
            src0 = base[0] if based else iu[0]
            old = jax.lax.dynamic_slice_in_dim(src0, n0, 1, axis=0)
            cclip = jnp.clip(
                own[(0, 1)][1] * jnp.asarray(dt, jnp.float32)
                * (1.0 / h[0]), 0.0, 1.0,
            )
            plane = old - cclip * (old - inner)
        else:
            plane = inner
        out0 = jax.lax.dynamic_update_slice_in_dim(out0, plane, n0, axis=0)
        u1p = out1[n0 - 1]
        d1 = (u1p[1:n1 + 1, :n2] - u1p[:n1, :n2]) * (1.0 / h[1])
        u2v = out2[n0 - 1][:n1, :n2]
        spec2 = own[(2, 1)]
        if spec2[0] == "copy":
            hi2 = u2v[:, n2 - 1:n2]
        elif spec2[0] == "wrap":
            hi2 = u2v[:, 0:1]
        else:
            hi2 = jnp.full((n1, 1), spec2[1], u2v.dtype)
        d2 = (jnp.concatenate([u2v[:, 1:], hi2], axis=1) - u2v) \
            * (1.0 / h[2])
        plane_rhs = (d1 + d2) * rho_over_dt
        if per[0] or hi0 == "conv":
            d0 = (plane[0, :n1, :n2] - inner[0, :n1, :n2]) * (1.0 / h[0])
            plane_rhs = plane_rhs + d0 * rho_over_dt
        if masked:
            fl = ((fluid_code[n0 - 1, :n1, :n2] >> 6) & 1)
            plane_rhs = plane_rhs * fl.astype(plane_rhs.dtype)
        rhs = rhs.at[n0 - 1].set(plane_rhs)
    return (out0, out1, out2), rhs


def predictor_rhs_3d(
    grid: GridSpec,
    bcs: BCTable,
    u: Sequence[Array],
    dt,
    nu: float,
    upwind_gamma: float = 0.0,
    rho: float = 1.0,
    tile: int = 8,
    interpret: bool = False,
    db: Optional[bool] = None,
    forcing=None,
    forcing_fields=None,
) -> tuple[tuple[Array, Array, Array], Array]:
    """Exact-layout entry point: pads to the internal layout, runs the
    fused kernel. ``u_star`` comes back internal (row r <-> global face/cell
    row r; comp 2 lane-elided) for :func:`correct_diag_3d`.
    ``forcing_fields``: per-face forcing volumes in the jnp predictor's
    convention (interior faces along the own axis; n distinct faces when
    that axis is periodic -- the shapes les.sgs_forcing returns)."""
    iu = to_internal_3d(grid, u, tile)
    ifld = (forcing_to_internal_3d(grid, bcs, forcing_fields, tile)
            if forcing_fields is not None else None)
    return predictor_rhs_3d_internal(
        grid, bcs, iu, dt, nu, upwind_gamma, rho, tile, interpret, db=db,
        forcing=forcing, forcing_fields=ifld,
    )


def _fused_corr_kernel(
    sc_ref, u0_hbm, u1_hbm, u2_hbm, p_hbm, *rest,
    T: int, n: tuple, h: tuple, own: dict, RP: int, halo: bool = False,
    halo1: bool = False,
    db: bool = True, masked: bool = False, hi0_copy: bool = False,
    conv_last: bool = False,
    per: tuple = (False, False, False),
    thermal: bool = False, alpha: float = 0.0, tgamma: float = 0.0,
    thg: dict = None, body_neumann: bool = False,
):
    """One axis-0 stripe of the projection corrector + step diagnostics,
    internal layout in AND out (row r <-> global row r).

    u* windows: rows [jT, jT+T(+1 for comp 0)); p window: padded rows
    [jT, jT+T+2) <-> global [jT-1, jT+T+1). Dirichlet boundary faces are
    preserved from u* (which carries the in-kernel-applied BC values);
    outflow faces get the zero-gradient copy of the corrected inner face.
    Diagnostics mask the garbage rows/sublanes/lanes beyond the physical
    extents. The margin stripe (j == G) zero-fills.
    """
    if masked and thermal:
        # heated-obstacle composition: the ISOTHERMAL body's theta is
        # clamped by the wrapper, so the flux-form update needs no extra
        # in-kernel masking (advective interface fluxes ride the already-
        # masked velocities; the diffusive flux against clamped solid
        # cells IS the staircase Dirichlet flux -- scalar.scalar_rhs)
        (th_hbm, c0_hbm, c1_hbm, c2_hbm, fc_hbm,
         out0, out1, out2, th_out, divmax_ref, velmax_ref,
         s0, s1, s2, sp, sth, sthlo, sems,
         cs0, cs1, cs2, cfs, csems) = rest
    elif masked:
        (c0_hbm, c1_hbm, c2_hbm, fc_hbm,
         out0, out1, out2, divmax_ref, velmax_ref,
         s0, s1, s2, sp, sems, cs0, cs1, cs2, cfs, csems) = rest
    elif thermal:
        (th_hbm, out0, out1, out2, th_out, divmax_ref, velmax_ref,
         s0, s1, s2, sp, sth, sthlo, sems) = rest
    else:
        (out0, out1, out2, divmax_ref, velmax_ref,
         s0, s1, s2, sp, sems) = rest
    j = pl.program_id(0)
    n0, n1, n2 = n
    # halo mode: n0 = local B; u* row B holds the exchanged shared-face
    # (or BC) value, p window ghosts come pre-concatenated in p_hbm, and
    # boundary-face preservation gates on sc_ref[1]/sc_ref[2].
    G = n0 // T if halo else n0 // T + 1
    # Double-buffered input windows (see _fused_pred_kernel): stripe j+1's
    # transfers start before stripe j's wait. db=False: single-buffered
    # serialized transfers (large planes; VMEM budget).
    phase = jax.lax.rem(j, 2) if db else 0
    H = (T + 1, T, T, T + 2)            # per-input window heights

    def _dma(jj, ph):
        st0 = jnp.minimum(jj * T, RP - (T + 1))
        st = jnp.minimum(jj * T, RP - T)
        stp = jj * T                     # p is padded to (G+1)*T + 2 rows
        starts = (st0, st, st, stp)
        cps = [
            pltpu.make_async_copy(
                ref.at[pl.ds(starts[k], H[k])],
                scr.at[pl.ds(ph * H[k], H[k])],
                sems.at[ph, k],
            )
            for k, (ref, scr) in enumerate(
                zip((u0_hbm, u1_hbm, u2_hbm, p_hbm), (s0, s1, s2, sp))
            )
        ]
        if masked:
            cps += [
                pltpu.make_async_copy(
                    ref.at[pl.ds(st0, T + 1)],
                    scr.at[pl.ds(ph * (T + 1), T + 1)],
                    csems.at[ph, k],
                )
                for k, (ref, scr) in enumerate(
                    zip((c0_hbm, c1_hbm, c2_hbm, fc_hbm),
                        (cs0, cs1, cs2, cfs))
                )
            ]
        if thermal:
            # theta main window: cells [jT, jT+T] (row jT+T may be the
            # refreshed hi ghost row n0); lo window: ONE row = cell jT-1,
            # or the refreshed lo ghost at RP-1 for stripe 0
            cps.append(pltpu.make_async_copy(
                th_hbm.at[pl.ds(st0, T + 1)],
                sth.at[pl.ds(ph * (T + 1), T + 1)],
                sems.at[ph, 4],
            ))
            st_lo = jnp.where(jj == 0, RP - 1, jj * T - 1)
            cps.append(pltpu.make_async_copy(
                th_hbm.at[pl.ds(st_lo, 1)],
                sthlo.at[pl.ds(ph, 1)],
                sems.at[ph, 5],
            ))
        return cps

    if db:
        @pl.when(j == 0)
        def _prologue():
            for cp in _dma(0, 0):
                cp.start()

        @pl.when(j < G)
        def _prefetch():
            for cp in _dma(j + 1, 1 - phase):
                cp.start()
    else:
        for cp in _dma(j, 0):
            cp.start()

    for cp in _dma(j, phase):
        cp.wait()
    scale = sc_ref[0]
    # traced BC values (time-dependent runs): markers -> SMEM reads
    _, own = _resolve_tables(None, own, sc_ref)
    sc_idx = 1
    if halo:
        is_first = sc_ref[1] > 0.5
        is_last = sc_ref[2] > 0.5
        sc_idx = 3
    if halo1:
        is_first1 = sc_ref[sc_idx] > 0.5
        is_last1 = sc_ref[sc_idx + 1] > 0.5
        sc_idx += 2

    @pl.when(j < G)
    def _data():
        u0s = s0[pl.ds(phase * (T + 1), T + 1)]
        u1s = s1[pl.ds(phase * T, T)]
        u2s = s2[pl.ds(phase * T, T)]
        pw = sp[pl.ds(phase * (T + 2), T + 2)]
        S0 = u0s.shape[1]
        pc = pw[1:T + 1]                     # p at cell rows [jT, jT+T)
        if masked:
            offc = phase * (T + 1)
            c0w = cs0[pl.ds(offc, T + 1)]
            c1w = cs1[pl.ds(offc, T + 1)]
            c2w = cs2[pl.ds(offc, T + 1)]
            fw = cfs[pl.ds(offc, T + 1)]

        # comp 0: faces rows [jT, jT+T+1), interior corrected with dp/dx0
        g0 = (pw[1:T + 2] - pw[:T + 1]) * (1.0 / h[0])
        u0n = u0s - scale * g0
        if masked:
            # only faces between two fluid cells are corrected (solid
            # cells carry a dummy p that must not leak); boundary faces
            # have no CORR bit, so BC preservation falls out too
            u0n = jnp.where(
                (c0w[:, :S0] & CORR_OK_3D) != 0, u0n, u0s)
        grow = _ax_iota(u0n.shape, 0) + j * T
        if halo:
            # the last shard's domain boundary face: Dirichlet faces are
            # preserved from u*; an axis-0 HI OUTFLOW face takes the
            # zero-gradient copy of the CORRECTED inner face (in-register
            # one row up) -- matching the jnp step's post-correction BC
            # re-application, so the theta flux and the divergence
            # diagnostic at the last cell row see the true face value
            hi_val = (jnp.roll(u0n, 1, axis=0)
                      if own[(0, 1)][0] == "copy" else u0s)
            u0n = jnp.where(
                (grow == 0) & is_first, u0s,
                jnp.where((grow == n0) & is_last, hi_val, u0n),
            )
        elif not per[0]:
            u0n = jnp.where((grow == 0) | (grow == n0), u0s, u0n)
        # (per[0]: faces 0 AND n0 are corrected with the wrap gradient --
        # the pressure window's pad rows carry p[n0-1] / p[0], so both get
        # the identical corrected value.)

        # comp 1: boundary faces Dirichlet-preserved or outflow-copied
        # (periodic: face 0 corrected with the wrap gradient, face n1 is
        # the mirrored duplicate). halo1 (pencil): the p window carries
        # jnp-refreshed ghost columns, so the roll-based gradient is
        # correct at face 0 (lo ghost at the last sublane) AND at the
        # shared face n1(=m1) (hi ghost at slot n1); boundary-face
        # handling gates on the sy edge flags.
        pc1m = (_shift_wrap(pc, 1, -1, n1) if per[1]
                else _shift_fix(pc, 1, -1, None))
        g1 = (pc - pc1m) * (1.0 / h[1])
        g1 = jnp.pad(g1, [(0, 0), (0, u1s.shape[1] - g1.shape[1]), (0, 0)])
        u1n = u1s - scale * g1
        if masked:
            u1n = jnp.where(
                (c1w[:T, :u1n.shape[1]] & CORR_OK_3D) != 0, u1n, u1s)
        s_i = _ax_iota(u1n.shape, 1)
        if halo1:
            # the shared face n1 needs g1 at face n1 = (p_ghost - p[n1-1]):
            # pc1m at slot n1 <- pc[n1-1] (roll), pc slot n1 = hi ghost --
            # already right. Edge shards preserve/copy the boundary faces.
            v1_lo = (_shift_fix(u1n, 1, 1, None)
                     if own[(1, 0)][0] == "copy" else u1s)
            v1_hi = (_shift_fix(u1n, 1, -1, None)
                     if own[(1, 1)][0] == "copy" else u1s)
            u1n = jnp.where(
                (s_i == 0) & is_first1, v1_lo,
                jnp.where((s_i == n1) & is_last1, v1_hi, u1n),
            )
        elif per[1]:
            u1n = jnp.where(s_i == n1, jnp.roll(u1n, n1, axis=1), u1n)
        else:
            v1_lo = (_shift_fix(u1n, 1, 1, None)
                     if own[(1, 0)][0] == "copy" else u1s)
            v1_hi = (_shift_fix(u1n, 1, -1, None)
                     if own[(1, 1)][0] == "copy" else u1s)
            u1n = jnp.where(
                s_i == 0, v1_lo, jnp.where(s_i == n1, v1_hi, u1n)
            )

        # comp 2 (lane-elided): faces 0..n2-1
        pc2m = (_shift_wrap(pc, 2, -1, n2) if per[2]
                else _shift_fix(pc, 2, -1, None))
        g2 = (pc - pc2m) * (1.0 / h[2])
        u2n = u2s - scale * g2
        if masked:
            u2n = jnp.where(
                (c2w[:T, :u2n.shape[1]] & CORR_OK_3D) != 0, u2n, u2s)
        l_i = _ax_iota(u2n.shape, 2)
        if not per[2]:
            v2_lo = (_shift_fix(u2n, 2, 1, None)
                     if own[(2, 0)][0] == "copy" else u2s)
            u2n = jnp.where(l_i == 0, v2_lo, u2n)

        # Scan-carried pad regions must stay identically zero: the next
        # step's predictor re-evolves whatever is here through the nonlinear
        # advection term (quadratic in the pad values), which can overflow
        # to inf/NaN over long scans even though no valid output ever reads
        # it. Valid faces/cells are untouched by these masks.
        zr = jnp.zeros((), u0n.dtype)
        # (halo mode: data stripes only cover valid rows [0, B); the row
        # bound is only live unsharded, the sublane/lane bounds in both.)
        keep0 = ((_ax_iota(u0n.shape, 0) + j * T <= n0)
                 & (_ax_iota(u0n.shape, 1) < n1)
                 & (_ax_iota(u0n.shape, 2) < n2))
        keep1 = ((_ax_iota(u1n.shape, 0) + j * T < n0)
                 & (s_i <= n1) & (_ax_iota(u1n.shape, 2) < n2))
        keep2 = ((_ax_iota(u2n.shape, 0) + j * T < n0)
                 & (_ax_iota(u2n.shape, 1) < n1) & (l_i < n2))
        if masked:
            # obstacle faces: re-zero closed faces (the correction gate
            # preserved u*'s zeros, but outflow copies could repopulate)
            keep0 = keep0 & ((c0w[:, :u0n.shape[1]] & FACE_OPEN_3D) != 0)
            keep1 = keep1 & ((c1w[:T, :u1n.shape[1]] & FACE_OPEN_3D) != 0)
            keep2 = keep2 & ((c2w[:T, :u2n.shape[1]] & FACE_OPEN_3D) != 0)
        u0n = jnp.where(keep0, u0n, zr)
        u1n = jnp.where(keep1, u1n, zr)
        u2n = jnp.where(keep2, u2n, zr)

        out0[...] = u0n[:T]
        out1[...] = u1n
        out2[...] = u2n

        if thermal:
            # conservative flux-form scalar update with the CORRECTED
            # (divergence-free) velocities in-register -- matches
            # scalar.scalar_rhs + the jnp step's end-of-step theta advance.
            scale_dt = sc_ref[sc_idx]
            S0w = u0n.shape[1]
            thw = sth[pl.ds(phase * (T + 1), T + 1)]   # cells jT..jT+T
            thc = thw[:T, :S0w]                        # cells jT..jT+T-1
            th_lo1 = sthlo[pl.ds(phase, 1)][:, :S0w]   # cell jT-1
            # cells k-1 aligned to cells k (axis 0)
            th_m0 = jnp.where(
                _ax_iota(thc.shape, 0) == 0,
                th_lo1, jnp.roll(thw[:T, :S0w], 1, axis=0),
            )
            th_p0 = thw[1:T + 1, :S0w]                 # cells k+1

            def face_th(t_m, t_p, uf):
                tf = 0.5 * (t_m + t_p)
                if tgamma > 0.0:
                    tf = (tgamma * jnp.where(uf > 0.0, t_m, t_p)
                          + (1.0 - tgamma) * tf)
                return tf

            # axis 0: fluxes at faces k (cells k-1,k) and k+1 (cells k,k+1)
            u0f = u0n[:, :S0w]
            if hi0_copy:
                # axis-0 HI outflow: the zero-gradient copy onto face n0
                # happens in the POST-kernel fixup (it can cross a stripe
                # boundary), but the stripe owning cell n0-1 has the
                # CORRECTED inner face in-register one row up -- patch it
                # here so the theta flux at face n0 uses the true copy
                # (convective outlets never reach the thermal kernel:
                # solver gate + wrapper assert)
                gf = _ax_iota(u0f.shape, 0) + j * T
                u0f = jnp.where(gf == n0, jnp.roll(u0f, 1, axis=0), u0f)
            f_lo0 = u0f[:T] * face_th(th_m0, thc, u0f[:T])
            f_hi0 = u0f[1:T + 1] * face_th(thc, th_p0, u0f[1:T + 1])
            adv = (f_hi0 - f_lo0) * (1.0 / h[0])
            if body_neumann:
                # adiabatic immersed body (scalar.body_bc NEUMANN): the
                # diffusive flux closes on fluid-solid faces. The velocity
                # FACE_OPEN bit is exactly scalar._face_open (interior:
                # fluid&fluid; boundary: the single adjacent cell), so the
                # cell-form Laplacian becomes the gated flux form --
                # identical where every face is open (scalar.scalar_rhs
                # close_body). Advective interface fluxes need no gate:
                # the corrected velocities are zero on closed faces.
                o_lo0 = ((c0w[:T, :S0w] & FACE_OPEN_3D) != 0) \
                    .astype(thc.dtype)
                o_hi0 = ((c0w[1:T + 1, :S0w] & FACE_OPEN_3D) != 0) \
                    .astype(thc.dtype)
                lap = ((th_p0 - thc) * o_hi0 - (thc - th_m0) * o_lo0) \
                    * (1.0 / (h[0] * h[0]))
            else:
                lap = (th_m0 - 2.0 * thc + th_p0) * (1.0 / (h[0] * h[0]))

            def gfix(ax, side, edge_idx):
                spec = thg[(ax, side)]
                if spec[0] == "wrap":
                    return None
                return (edge_idx, spec[1], spec[2])

            # axis 1 (sublanes): flux at faces s (cells s-1, s), s = 0..n1
            if halo1:
                # pencil: theta's ghost cells ride the refreshed slots
                # (hi at sublane n1, lo at the last sublane), so every
                # shift is a plain roll -- incl. the shared-face flux at
                # slot n1 off the corrected u1n there
                tp1g = jnp.pad(
                    thc, [(0, 0), (0, u1n.shape[1] - S0w), (0, 0)]
                )
                t_m1 = _shift_fix(tp1g, 1, -1, None)
                F1 = u1n * face_th(t_m1, tp1g, u1n)
                adv = adv + (jnp.roll(F1, -1, axis=1) - F1)[:, :S0w] \
                    * (1.0 / h[1])
                t_hi1 = _shift_fix(thc, 1, 1, None)
                t_lo1 = _shift_fix(thc, 1, -1, None)
            else:
                tp1 = jnp.pad(
                    thc, [(0, 0), (0, u1n.shape[1] - S0w), (0, 0)]
                )
                s_i1 = _ax_iota(tp1.shape, 1)
                if thg[(1, 1)][0] == "wrap":
                    gh1 = jnp.roll(tp1, n1, axis=1)    # cell n1 = cell 0
                else:
                    _, a1h, b1h = thg[(1, 1)]
                    gh1 = a1h * jnp.roll(tp1, 1, axis=1) + b1h
                tp1g = jnp.where(s_i1 == n1, gh1, tp1)  # + ghost cell n1
                t_m1 = (_shift_wrap(tp1g, 1, -1, n1)
                        if thg[(1, 0)][0] == "wrap"
                        else _shift_fix(tp1g, 1, -1, gfix(1, 0, 0)))
                F1 = u1n * face_th(t_m1, tp1g, u1n)
                adv = adv + (jnp.roll(F1, -1, axis=1) - F1)[:, :S0w] \
                    * (1.0 / h[1])
                t_hi1 = (_shift_wrap(thc, 1, 1, n1)
                         if thg[(1, 1)][0] == "wrap"
                         else _shift_fix(thc, 1, 1, gfix(1, 1, n1 - 1)))
                t_lo1 = (_shift_wrap(thc, 1, -1, n1)
                         if thg[(1, 0)][0] == "wrap"
                         else _shift_fix(thc, 1, -1, gfix(1, 0, 0)))
            if body_neumann:
                # faces s live at sublane s (s = 0..n1); face s+1 via roll
                o1 = (c1w & FACE_OPEN_3D) != 0
                o_lo1 = o1[:T, :S0w].astype(thc.dtype)
                o_hi1 = jnp.roll(o1, -1, axis=1)[:T, :S0w] \
                    .astype(thc.dtype)
                lap = lap + ((t_hi1 - thc) * o_hi1
                             - (thc - t_lo1) * o_lo1) \
                    * (1.0 / (h[1] * h[1]))
            else:
                lap = lap + (t_lo1 - 2.0 * thc + t_hi1) \
                    * (1.0 / (h[1] * h[1]))

            # axis 2 (lanes): u2n carries faces 0..n2-1 (hi face elided)
            t_m2 = (_shift_wrap(thc, 2, -1, n2)
                    if thg[(2, 0)][0] == "wrap"
                    else _shift_fix(thc, 2, -1, gfix(2, 0, 0)))
            F2 = u2n * face_th(t_m2, thc, u2n)
            # face n2's flux: the elided hi face value x the ghost average
            t_hi2 = (_shift_wrap(thc, 2, 1, n2)
                     if thg[(2, 1)][0] == "wrap"
                     else _shift_fix(thc, 2, 1, gfix(2, 1, n2 - 1)))
            if per[2]:
                # face n2 == face 0: patched roll (plain roll reads the
                # zeroed pad lane when n2 < L)
                F2hi = _shift_wrap(F2, 2, 1, n2)
            else:
                sp2 = own[(2, 1)]
                uhi_arr = (_shift_fix(u2n, 2, 1, (n2 - 1, 1.0, 0.0))
                           if sp2[0] == "copy"
                           else jnp.full_like(u2n, sp2[1]))
                fhi_face = uhi_arr * face_th(thc, t_hi2, uhi_arr)
                F2hi = jnp.where(
                    _ax_iota(F2.shape, 2) == n2 - 1,
                    fhi_face, jnp.roll(F2, -1, axis=2),
                )
            adv = adv + (F2hi - F2) * (1.0 / h[2])
            if body_neumann:
                # faces 0..n2-1 at lanes; the lane-elided face n2's open
                # bit is the FLUID bit of cell n2-1 (face_masks_from_solid:
                # a boundary face follows its single adjacent cell)
                o2 = (c2w[:T, :S0w] & FACE_OPEN_3D) != 0
                flu = (fw[:T, :S0w] & (1 << 6)) != 0
                o_hi2 = jnp.where(
                    _ax_iota(o2.shape, 2) == n2 - 1,
                    flu, jnp.roll(o2, -1, axis=2),
                ).astype(thc.dtype)
                lap = lap + ((t_hi2 - thc) * o_hi2
                             - (thc - t_m2) * o2.astype(thc.dtype)) \
                    * (1.0 / (h[2] * h[2]))
            else:
                lap = lap + (t_m2 - 2.0 * thc + t_hi2) \
                    * (1.0 / (h[2] * h[2]))

            th_new = thc + scale_dt * (alpha * lap - adv)
            keep_t = ((_ax_iota(th_new.shape, 0) + j * T < n0)
                      & (_ax_iota(th_new.shape, 1) < n1)
                      & (_ax_iota(th_new.shape, 2) < n2))
            th_out[...] = jnp.where(keep_t, th_new, 0.0)

        # diagnostics over the valid physical region only
        if per[2]:
            u2hi = _shift_wrap(u2n, 2, 1, n2)
        else:
            spec = own[(2, 1)]
            fix = ((n2 - 1, 1.0, 0.0) if spec[0] == "copy"
                   else (n2 - 1, 0.0, spec[1]))
            u2hi = _shift_fix(u2n, 2, 1, fix)
        dd = (u0n[1:T + 1] - u0n[:T]) * (1.0 / h[0]) \
            + (_shift_fix(u1n, 1, 1, None) - u1n)[:, :S0] * (1.0 / h[1]) \
            + (u2hi - u2n) * (1.0 / h[2])
        r_c = _ax_iota(dd.shape, 0) + j * T
        s_c = _ax_iota(dd.shape, 1)
        l_c = _ax_iota(dd.shape, 2)
        # hi0_copy (axis-0 HI outflow): cell row n0-1's divergence uses
        # face row n0, which only gets its zero-gradient copy in the
        # post-kernel fixup -- exclude it here, the wrapper maxes it in
        valid = (r_c < (n0 - 1 if hi0_copy else n0)) \
            & (s_c < n1) & (l_c < n2)
        if conv_last:
            # sharded convective outlet: the last shard's cell row B-1
            # reads the held face row B, whose transport update +
            # Dirichlet-ghost correction happen at the WRAPPER level --
            # exclude it here, the wrapper folds the recomputed plane in
            valid = valid & jnp.logical_not(
                (r_c == n0 - 1) & is_last
            )
        if masked:
            valid = valid & ((fw[:T, :dd.shape[1]] & (1 << 6)) != 0)
        divm = jnp.max(jnp.where(valid, jnp.abs(dd), 0.0))
        if halo:
            # the shared face row B is counted by the shard that owns it
            # (the next shard's row 0) except on the last shard, where row
            # B is the domain-boundary face
            if conv_last:
                # ... which the wrapper corrects and folds in (see above)
                lim0 = jnp.int32(n0)
            else:
                lim0 = jnp.where(is_last, n0 + 1, n0)
        else:
            # hi0_copy: face row n0 duplicates row n0-1 after the fixup --
            # its in-kernel (pre-fixup) value must not enter the max
            lim0 = n0 if hi0_copy else n0 + 1
        vel = jnp.max(jnp.where(
            (_ax_iota(u0n.shape, 0) + j * T < lim0)
            & (_ax_iota(u0n.shape, 1) < n1) & (_ax_iota(u0n.shape, 2) < n2),
            jnp.abs(u0n), 0.0)) * (1.0 / h[0])
        vel = jnp.maximum(vel, jnp.max(jnp.where(
            (_ax_iota(u1n.shape, 0) + j * T < n0)
            & (_ax_iota(u1n.shape, 1) <= n1) & (_ax_iota(u1n.shape, 2) < n2),
            jnp.abs(u1n), 0.0)) * (1.0 / h[1]))
        vel = jnp.maximum(vel, jnp.max(jnp.where(
            (_ax_iota(u2n.shape, 0) + j * T < n0)
            & (_ax_iota(u2n.shape, 1) < n1) & (_ax_iota(u2n.shape, 2) < n2),
            jnp.abs(u2n), 0.0)) * (1.0 / h[2]))
        divmax_ref[...] = jnp.full(divmax_ref.shape, divm)
        velmax_ref[...] = jnp.full(velmax_ref.shape, vel)

    @pl.when(j == G)
    def _margin():
        out0[...] = jnp.zeros(out0.shape, out0.dtype)
        out1[...] = jnp.zeros(out1.shape, out1.dtype)
        out2[...] = jnp.zeros(out2.shape, out2.dtype)
        if thermal:
            th_out[...] = jnp.zeros(th_out.shape, th_out.dtype)
        divmax_ref[...] = jnp.zeros(divmax_ref.shape, divmax_ref.dtype)
        velmax_ref[...] = jnp.zeros(velmax_ref.shape, velmax_ref.dtype)


def correct_diag_3d_internal(
    grid: GridSpec,
    bcs: BCTable,
    u_star_internal,
    p: Array,
    scale,
    tile: int = 8,
    interpret: bool = False,
    halo: bool = False,
    edge_flags=None,
    halo1: bool = False,
    edge_flags1=None,
    pp=None,
    db: Optional[bool] = None,
    face_codes=None,
    fluid_code=None,
    theta=None,
    scalar_cfg=None,
    dt=None,
    body_neumann: bool = False,
    conv_last: bool = False,
):
    """Fused corrector + diagnostics over internal-layout u*; returns
    internal-layout u_new plus (max |div u|, max_a |u_a|/h_a) -- and,
    when ``theta``/``scalar_cfg``/``dt`` are given, the advanced scalar
    as a fourth result (the flux-form theta update fused into the same
    HBM pass, using the corrected in-register velocities exactly like the
    jnp step's end-of-step scalar advance).

    ``halo=True``: local-block mode; ``pp`` must be the pre-built padded
    pressure with ppermute ghost rows at [0] and [B+1]. ``db``: see
    :func:`predictor_rhs_3d_internal`. ``face_codes``/``fluid_code``
    enable obstacle masking; an axis-0 HI outflow face is patched
    post-kernel (one plane: copy + its divergence row)."""
    n0, n1, n2 = grid.shape
    h = tuple(float(x) for x in grid.spacing)
    if halo1:
        assert halo, "pencil mode layers on the axis-0 halo machinery"
        T, G, RP, S0, S1, L = _halo_dims_pencil(grid, tile)
    elif halo:
        T, G, RP, S0, S1, L = _halo_dims(grid, tile)
    else:
        T, G, RP, S0, S1, L = _fused_dims(grid, tile)
    if db is None:
        db = _db_for_plane(S1, L)
    nb = 2 if db else 1
    masked = face_codes is not None

    from ..bcs import periodic_axes

    per = tuple(periodic_axes(grid, bcs))
    if halo:
        per = (False,) + per[1:]   # axis-0 wrap rides the ppermute rings
    if halo1:
        per = (per[0], False, per[2])   # the sy ring closes axis-1 wraps
        # obstacles compose: see predictor_rhs_3d_internal's halo1 note
    assert not (masked and any(per)), "obstacles + periodic not supported"
    u0p, u1p, u2p = u_star_internal
    if pp is None:
        pp = jnp.pad(p, [(1, RP + 2 - 1 - n0), (0, S0 - n1), (0, L - n2)])
        if per[0]:
            # wrap-pad the pressure rows: pad row 0 <-> global row -1 =
            # p[n0-1]; pad row n0+1 <-> global row n0 = p[0]. Both axis-0
            # boundary faces then receive the identical wrap-gradient
            # correction in-kernel (face n0 is the duplicate of face 0).
            upd = jax.lax.dynamic_update_slice_in_dim
            pp = upd(pp, pp[n0:n0 + 1], 0, axis=0)
            pp = upd(pp, pp[1:2], n0 + 1, axis=0)
    _, own = _ghost_tables(grid, bcs)
    hi0_kind = own[(0, 1)][0] if not halo else None
    hi0_copy = hi0_kind in ("copy", "conv")
    thermal = theta is not None
    if thermal:
        # masked composes for BOTH body kinds: an ISOTHERMAL body's theta
        # is clamped by the caller before AND after the step (the lap
        # term against clamped solid neighbors IS the staircase Dirichlet
        # flux), an ADIABATIC body (``body_neumann``) closes the
        # diffusive flux on fluid-solid faces in-kernel via the FACE_OPEN
        # bits; advective interface fluxes ride the masked velocities
        # either way.
        # Axis-0 HI OUTFLOW composes too: the theta flux at face n0 uses
        # the in-register corrected-inner-face copy (kernel patch above);
        # convective transport stays out (its face update needs the held
        # face + dt, and the solver gates conv + scalar off anyway).
        assert hi0_kind != "conv", "fused thermal: no convective outlet"
        thg = theta_ghost_table(scalar_cfg, 3)
        assert thg is not None
        if not halo:
            # (halo mode: parallel/fused_sharded.py pre-fills the ghost
            # rows with ppermuted neighbor rows / edge-BC synthesis)
            theta = refresh_theta_axis0_ghosts(theta, thg, n0, RP)
    parts = [jnp.asarray(scale, jnp.float32)]
    if halo:
        parts += [jnp.asarray(f, jnp.float32) for f in edge_flags]
    if halo1:
        parts += [jnp.asarray(f, jnp.float32) for f in edge_flags1]
    if thermal:
        parts.append(jnp.asarray(dt, jnp.float32))
    # traced BC values -> SMEM appends (after the fixed slots; see
    # predictor_rhs_3d_internal)
    _, own_k = _hoist_tables({}, own, parts)
    sc = jnp.stack(parts)
    kern = functools.partial(
        _fused_corr_kernel, T=T, n=(n0, n1, n2), h=h, own=own_k, RP=RP,
        halo=halo, halo1=halo1, db=db, masked=masked, hi0_copy=hi0_copy,
        per=per,
        thermal=thermal,
        alpha=float(scalar_cfg.diffusivity) if thermal else 0.0,
        tgamma=float(scalar_cfg.upwind_gamma) if thermal else 0.0,
        thg=thg if thermal else None,
        body_neumann=bool(body_neumann and masked and thermal),
        conv_last=bool(conv_last and halo),
    )
    scratch = [
        pltpu.VMEM((nb * (T + 1), S0, L), jnp.float32),
        pltpu.VMEM((nb * T, S1, L), jnp.float32),
        pltpu.VMEM((nb * T, S0, L), jnp.float32),
        pltpu.VMEM((nb * (T + 2), S0, L), jnp.float32),
    ]
    if thermal:
        scratch += [
            pltpu.VMEM((nb * (T + 1), S0, L), jnp.float32),
            pltpu.VMEM((nb * 1, S0, L), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 6 if thermal else 4)))
    args = (sc, u0p, u1p, u2p, pp)
    if thermal:
        args += (theta,)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * (5 if thermal else 4)
    if masked:
        SC = _round_up(S0, 32) if halo1 else _code_sublanes(grid)
        args += (face_codes[0], face_codes[1], face_codes[2], fluid_code)
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 4
        scratch += [
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.VMEM((nb * (T + 1), SC, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    vol = pl.BlockSpec((T, S0, L), lambda j: (j, 0, 0),
                       memory_space=pltpu.VMEM)
    red = pl.BlockSpec((1, 8, 128), lambda j: (j, 0, 0),
                       memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((RP, S0, L), jnp.float32),
        jax.ShapeDtypeStruct((RP, S1, L), jnp.float32),
        jax.ShapeDtypeStruct((RP, S0, L), jnp.float32),
    ]
    out_specs = [
        vol,
        pl.BlockSpec((T, S1, L), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        vol,
    ]
    if thermal:
        out_shape.append(jax.ShapeDtypeStruct((RP, S0, L), jnp.float32))
        out_specs.append(vol)
    out_shape += [
        jax.ShapeDtypeStruct((G + 1, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G + 1, 8, 128), jnp.float32),
    ]
    out_specs += [red, red]
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
        out0, out1, out2, theta_new, divp, velp = res
    else:
        out0, out1, out2, divp, velp = res
    divm = jnp.max(divp)
    velm = jnp.max(velp)
    if hi0_copy:
        # axis-0 HI outflow: zero-gradient copy of the CORRECTED inner
        # face onto face row n0 (d0 = 0 at cell n0-1); convective: the
        # held face gets the Dirichlet-ghost pressure correction
        # (+2 scale p_edge / h on the hi face) and a nonzero d0. Then the
        # excluded divergence plane (cell row n0-1) is folded into the max.
        inner_c = jax.lax.dynamic_slice_in_dim(out0, n0 - 1, 1, axis=0)
        if hi0_kind == "conv":
            held = jax.lax.dynamic_slice_in_dim(out0, n0, 1, axis=0)
            pedge = jax.lax.dynamic_slice_in_dim(
                jnp.pad(p, [(0, 0), (0, S0 - n1), (0, L - n2)]),
                n0 - 1, 1, axis=0,
            )
            plane = held + (2.0 * jnp.asarray(scale, jnp.float32)
                            * (1.0 / h[0])) * pedge
            velm = jnp.maximum(
                velm,
                jnp.max(jnp.abs(plane[0, :n1, :n2])) * (1.0 / h[0]),
            )
        else:
            plane = inner_c
        out0 = jax.lax.dynamic_update_slice_in_dim(out0, plane, n0, axis=0)
        u1pl = out1[n0 - 1]
        d1 = (u1pl[1:n1 + 1, :n2] - u1pl[:n1, :n2]) * (1.0 / h[1])
        u2v = out2[n0 - 1][:n1, :n2]
        spec2 = own[(2, 1)]
        if spec2[0] == "copy":
            hi2 = u2v[:, n2 - 1:n2]
        elif spec2[0] == "wrap":
            hi2 = u2v[:, 0:1]
        else:
            hi2 = jnp.full((n1, 1), spec2[1], u2v.dtype)
        d2 = (jnp.concatenate([u2v[:, 1:], hi2], axis=1) - u2v) \
            * (1.0 / h[2])
        dplane = d1 + d2
        if hi0_kind == "conv":
            dplane = dplane + (plane[0, :n1, :n2]
                               - inner_c[0, :n1, :n2]) * (1.0 / h[0])
        if masked:
            fl = ((fluid_code[n0 - 1, :n1, :n2] >> 6) & 1)
            dplane = dplane * fl.astype(dplane.dtype)
        divm = jnp.maximum(divm, jnp.max(jnp.abs(dplane)))
    if thermal:
        return (out0, out1, out2), divm, velm, theta_new
    return (out0, out1, out2), divm, velm


def correct_diag_3d(
    grid: GridSpec,
    bcs: BCTable,
    u_star_padded: tuple[Array, Array, Array],
    p: Array,
    scale,
    tile: int = 8,
    interpret: bool = False,
    db: Optional[bool] = None,
) -> tuple[tuple[Array, Array, Array], Array, Array]:
    """Exact-layout entry point: runs the internal corrector and converts
    u_new back to exact face arrays."""
    iu, divm, velm = correct_diag_3d_internal(
        grid, bcs, u_star_padded, p, scale, tile, interpret, db=db
    )
    u0, u1, u2e, face = from_internal_3d(grid, bcs, iu)
    # the corrected interior face feeds the outflow copy; Dirichlet gets
    # the BC value -- from_internal_3d encodes both via the own-face spec
    u2 = jnp.concatenate([u2e, face], axis=2)
    return (u0, u1, u2), divm, velm


# ---------------------------------------------------------------------------
# Fused 3D Poisson residual r = (b - A p) * fluid for the spectral solve's
# iterative-refinement pass. XLA's fusion of the uint8-decoded 7-point
# stencil measured 0.80 ms/step at 256^3 (~2.3x the HBM floor: it re-reads
# the shifted p planes); this kernel streams p/b/diag/code once per stripe.
# No ghost synthesis at all: out-of-window neighbor reads are roll garbage
# that the zero presence bits at the boundary annihilate (finite x 0 = 0),
# exactly matching ops.poisson._neighbor_sum's zero-pad semantics.
# ---------------------------------------------------------------------------


def _residual3d_kernel(
    p_hbm, b_hbm, d_hbm, c_hbm, out_ref,
    sp, sb, sd, sc, sems,
    *, T: int, n: tuple, w: tuple,
):
    i = pl.program_id(0)
    n0, n1, n2 = n
    R2 = T + 2
    phase = jax.lax.rem(i, 2)
    G = n0 // T
    H = (R2, T, T, T)

    def _dma(j, ph):
        # p is padded to n0+1 rows, so [jT-1, jT+T+1) always fits; the
        # clamp only lifts stripe 0's start to 0 (handled by body(ro=0))
        stp = jnp.clip(j * T - 1, 0, (n0 + 1) - R2)
        st = j * T
        starts = (stp, st, st, st)
        return [
            pltpu.make_async_copy(
                ref.at[pl.ds(starts[k], H[k])],
                scr.at[pl.ds(ph * H[k], H[k])],
                sems.at[ph, k],
            )
            for k, (ref, scr) in enumerate(
                zip((p_hbm, b_hbm, d_hbm, c_hbm), (sp, sb, sd, sc))
            )
        ]

    @pl.when(i == 0)
    def _prologue():
        for cp in _dma(0, 0):
            cp.start()

    @pl.when(i < G - 1)
    def _prefetch():
        for cp in _dma(i + 1, 1 - phase):
            cp.start()

    for cp in _dma(i, phase):
        cp.wait()

    pw = sp[pl.ds(phase * R2, R2)]
    b = sb[pl.ds(phase * T, T)]
    diag = sd[pl.ds(phase * T, T)]
    code = sc[pl.ds(phase * T, T)].astype(jnp.int32)

    def body(ro: int):
        pc = pw[ro:ro + T]
        if ro == 0:
            p_up = jnp.roll(pw, 1, axis=0)[0:T]      # row -1: killed by code
        else:
            p_up = pw[ro - 1:ro - 1 + T]
        p_dn = pw[ro + 1:ro + 1 + T]
        p_lf = _shift_fix(pc, 1, -1, None)
        p_rt = _shift_fix(pc, 1, 1, None)
        p_bk = _shift_fix(pc, 2, -1, None)
        p_fr = _shift_fix(pc, 2, 1, None)
        zero = jnp.float32(0.0)
        acc = diag * pc
        for bit, nbr_, wa in (
            (1, p_up, w[0]), (2, p_dn, w[0]),
            (4, p_lf, w[1]), (8, p_rt, w[1]),
            (16, p_bk, w[2]), (32, p_fr, w[2]),
        ):
            acc = acc + wa * jnp.where((code & bit) > 0, nbr_, zero)
        fluid = ((code >> 6) & 1).astype(jnp.float32)
        out_ref[...] = (b - acc) * fluid

    @pl.when(i == 0)
    def _first():
        body(0)

    @pl.when(i > 0)
    def _rest():
        body(1)


def residual_3d_applicable(op, p) -> bool:
    import math

    if p.ndim != 3 or p.dtype != jnp.float32:
        return False
    if any(op.periodic or ()):
        return False                       # wrap neighbors not wired
    n0, n1, n2 = p.shape
    return math.gcd(8, n0) >= 4 and jax.default_backend() == "tpu"


def residual_3d(op, p: Array, b: Array, tile: int = 8,
                interpret: bool = False) -> Array:
    """``(b - A p) * fluid`` via one fused stripe pass (see above)."""
    import math

    n0, n1, n2 = p.shape
    T = math.gcd(tile, n0)
    G = n0 // T
    S = _round_up(n1, 8)
    L = _round_up(n2, 128)

    def pad(x, rows=0):
        return jnp.pad(x, [(0, rows), (0, S - n1), (0, L - n2)])

    # p gets one extra (zero) row so the last stripe's +1-row window fits;
    # its value never contributes (the hi presence bit is 0 at row n0-1)
    pp = pad(p, rows=1)
    bb, dd = pad(b), pad(op.diag)
    cc = jnp.pad(op.code, [(0, 0), (0, S - n1), (0, L - n2)])
    kern = functools.partial(
        _residual3d_kernel, T=T, n=(n0, n1, n2),
        w=tuple(float(x) for x in op.w),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G * T, S, L), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (T, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2), S, L), jnp.float32),
            pltpu.VMEM((2 * T, S, L), jnp.float32),
            pltpu.VMEM((2 * T, S, L), jnp.float32),
            pltpu.VMEM((2 * T, S, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pp, bb, dd, cc)
    return out[:, :n1, :n2]
