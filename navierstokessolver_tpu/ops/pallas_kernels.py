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
