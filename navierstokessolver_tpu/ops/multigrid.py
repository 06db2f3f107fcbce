"""Geometric multigrid pressure solver (V-cycles, red-black smoothing).

Fills the gap the spectral solver can't: obstacle masks and outflow
(Dirichlet) faces, where unpreconditioned CG needs O(n) iterations. The
hierarchy rediscretizes the masked Laplacian on 2x-coarsened grids
(discretization coarse approximation): a coarse cell is solid only when ALL
its children are solid, so thin fluid channels stay connected. Transfers are
scatter-free (reshape-mean restriction, repeat prolongation) and the whole
cycle is a fixed unrolled structure inside ``lax.while_loop`` -- jit/scan/
GSPMD-friendly like everything else.

Stopping rule: same relative-L2 residual as ops/poisson.py, so "Poisson
iters to fixed residual" (BASELINE metric) compares across methods; iters
are reported in V-cycles.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..bcs import BCTable
from ..grid import GridSpec
from .poisson import (
    PoissonOp,
    _rb_sweep,
    apply_A,
    build_poisson_op,
    deflate,
    flexible_pcg,
    residual_norm,
)

Array = jax.Array


def _coarsen_solid(solid: np.ndarray) -> np.ndarray:
    """Coarse cell is solid iff all 2^d children are solid."""
    nd = solid.ndim
    out = solid
    for a in range(nd):
        n = out.shape[a]
        sh = list(out.shape)
        sh[a] = n // 2
        sh.insert(a + 1, 2)
        out = out.reshape(sh).all(axis=a + 1)
    return out


def _can_coarsen(shape: tuple[int, ...], min_size: int = 4) -> bool:
    return all(n % 2 == 0 and n // 2 >= min_size for n in shape)


def _restrict(r: Array) -> Array:
    """Full-weighting (2^d-child average) restriction, scatter-free."""
    nd = r.ndim
    out = r
    for a in range(nd):
        n = out.shape[a]
        sh = list(out.shape)
        sh[a] = n // 2
        sh.insert(a + 1, 2)
        out = out.reshape(sh).mean(axis=a + 1)
    return out


def shard_split(shapes: list[tuple[int, ...]], ctx) -> int:
    """Number of leading hierarchy levels that run SHARDED under ``ctx``
    (parallel/halo.py explicit-comm multigrid). Level l stays sharded while
    every ctx-sharded grid axis divides evenly over its devices; an EVEN
    local size is additionally required only to CONTINUE sharding into
    level l+1 (so the 2x restriction is purely local, children pairs never
    straddling a shard boundary). The DEEPEST sharded level itself may
    have an odd local size -- its restriction gathers the fine residual
    first, and _rb_sweep applies a global parity offset, so correctness
    does not depend on evenness there (ADVICE r3 doc fix). Levels past the
    split run REPLICATED: their global extent is at most
    2*min_size*max(devices) cells per axis -- all_gather'ing that is a few
    KB over ICI, and every device then smooths the tiny coarse problem
    redundantly (identical inputs -> lockstep results, no divergence)."""
    split = 0
    for shp in shapes:
        nd = len(shp)
        if not all(
            shp[a] % ctx.sizes[a] == 0
            for a in range(nd) if ctx.sharded(a)
        ):
            break
        split += 1
        if not all(
            (shp[a] // ctx.sizes[a]) % 2 == 0
            for a in range(nd) if ctx.sharded(a)
        ):
            break
    return split


def _gather_full(x: Array, ctx) -> Array:
    """all_gather a block-local array to the full global array (in grid
    order) along every ctx-sharded axis."""
    for a in range(x.ndim):
        if ctx.sharded(a):
            x = jax.lax.all_gather(x, ctx.axes[a], axis=a, tiled=True)
    return x


def _slice_local(x: Array, ctx) -> Array:
    """The local block of a replicated full array (inverse of _gather_full)."""
    for a in range(x.ndim):
        if ctx.sharded(a):
            n_local = x.shape[a] // ctx.sizes[a]
            start = jax.lax.axis_index(ctx.axes[a]) * n_local
            x = jax.lax.dynamic_slice_in_dim(x, start, n_local, axis=a)
    return x


def _prolong(e: Array, periodic: tuple[bool, ...] = (), ctx=None) -> Array:
    """Tensor-product (bi/tri)linear prolongation for cell-centered grids.

    Along each axis, fine cells 2i / 2i+1 get 0.75*c[i] + 0.25*c[i -/+ 1]
    (edge-replicated: the homogeneous-Neumann-consistent choice; wrap
    neighbors along periodic axes). Linear interpolation is what restores
    the textbook O(0.1-0.3) V-cycle rate -- piecewise-constant injection
    degrades it to ~0.9 (measured). Scatter-free: shifts + stack/reshape
    interleave.
    """
    nd = e.ndim
    per = periodic or (False,) * nd
    out = e
    for a in range(nd):
        if ctx is not None and ctx.sharded(a):
            # neighbor coarse cells along a sharded axis live on the ring
            # neighbors: ppermute ghost slabs (wraparound on periodic
            # axes); open ring ends replicate the edge cell -- the same
            # homogeneous-Neumann-consistent choice as the local branch.
            gl, gr = ctx.ghosts(out, a, per[a])
            sl_first = [slice(None)] * nd
            sl_first[a] = slice(0, 1)
            sl_last = [slice(None)] * nd
            sl_last[a] = slice(-1, None)
            if not per[a]:
                idx = jax.lax.axis_index(ctx.axes[a])
                gl = jnp.where(idx == 0, out[tuple(sl_first)], gl)
                gr = jnp.where(idx == ctx.sizes[a] - 1,
                               out[tuple(sl_last)], gr)
            sl_m = [slice(None)] * nd
            sl_m[a] = slice(0, -1)
            sl_p = [slice(None)] * nd
            sl_p[a] = slice(1, None)
            cm = jnp.concatenate([gl, out[tuple(sl_m)]], axis=a)
            cp = jnp.concatenate([out[tuple(sl_p)], gr], axis=a)
            lo = 0.75 * out + 0.25 * cm
            hi = 0.75 * out + 0.25 * cp
            st = jnp.stack([lo, hi], axis=a + 1)
            shape = list(out.shape)
            shape[a] *= 2
            out = st.reshape(shape)
            continue
        if per[a]:
            cm = jnp.roll(out, 1, axis=a)
            cp = jnp.roll(out, -1, axis=a)
            lo = 0.75 * out + 0.25 * cm
            hi = 0.75 * out + 0.25 * cp
            st = jnp.stack([lo, hi], axis=a + 1)
            shape = list(out.shape)
            shape[a] *= 2
            out = st.reshape(shape)
            continue
        sl_first = [slice(None)] * nd
        sl_first[a] = slice(0, 1)
        sl_last = [slice(None)] * nd
        sl_last[a] = slice(-1, None)
        sl_m = [slice(None)] * nd
        sl_m[a] = slice(0, -1)
        sl_p = [slice(None)] * nd
        sl_p[a] = slice(1, None)
        cm = jnp.concatenate([out[tuple(sl_first)], out[tuple(sl_m)]], axis=a)
        cp = jnp.concatenate([out[tuple(sl_p)], out[tuple(sl_last)]], axis=a)
        lo = 0.75 * out + 0.25 * cm   # fine cell 2i
        hi = 0.75 * out + 0.25 * cp   # fine cell 2i+1
        st = jnp.stack([lo, hi], axis=a + 1)
        shape = list(out.shape)
        shape[a] *= 2
        out = st.reshape(shape)
    return out


@dataclasses.dataclass(eq=False)
class MGPoissonSolver:
    """V-cycle hierarchy for one (grid, bcs, solid) problem."""

    grid: GridSpec
    ops: list[PoissonOp]
    pre: int = 2
    post: int = 2
    coarse_iters: int = 60
    omega: float = 1.0                 # smoother relaxation (RB-GS)
    coarse_omega: float = 1.0          # coarse-solve relaxation (RB-SOR)
    # Fused Pallas sweep kernel for the large 2D levels (auto on TPU).
    use_pallas: bool = False
    # Fused V-cycle level kernels (pallas_kernels.mg_pre_sweeps_residual /
    # mg_add_post_sweeps): collapse pre-smooth+residual and prolong-add+
    # post-smooth+convergence-check into one HBM pass each on 2D >=128
    # non-periodic levels. Auto-on for TPU in build(); must be disabled
    # under GSPMD sharding (parallel/sharding.sharded_simulation does).
    fused: bool = False
    interpret: bool = False            # pallas interpret mode (CPU tests)

    @staticmethod
    def build(
        grid: GridSpec,
        bcs: BCTable,
        solid: Optional[np.ndarray] = None,
        pre: int = 2,
        post: int = 2,
        coarse_iters: int = 60,
        min_size: int = 4,
        max_levels: int = 8,
        use_pallas: Optional[bool] = None,
        fused: Optional[bool] = None,
        sdf=None,
    ) -> "MGPoissonSolver":
        """``max_levels`` bounds the hierarchy depth: each level statically
        unrolls into the jitted program, and on very large grids (2048^2 is
        10 levels at min_size=4) the full-step XLA compile blows past the
        remote-compiler budget on this sandbox. The bottom level compensates
        with an SOR coarse solve at the textbook-optimal omega, so the
        truncated hierarchy keeps the V-cycle contraction.

        ``sdf``: cut-cell sharp-pressure mode (cutcell.py) -- every level
        REDISCRETIZES the apertured operator from the exact signed
        distance at that level's resolution (more accurate than
        coarsening apertures)."""
        ops = []
        g = grid
        s = None if solid is None else np.asarray(solid, bool)
        while True:
            if sdf is not None:
                from .. import cutcell
                from .poisson import build_poisson_op_cut

                ap, fl, _ = cutcell.cut_geometry(g, sdf)
                op = build_poisson_op_cut(g, bcs, ap, fl)
            else:
                op = build_poisson_op(g, bcs, s)
            ops.append(op)
            if len(ops) >= max_levels or not _can_coarsen(g.shape, min_size):
                break
            g = GridSpec(
                shape=tuple(n // 2 for n in g.shape),
                lengths=g.lengths,
                dtype=g.dtype,
            )
            s = None if s is None else _coarsen_solid(s)
        import math

        n_coarse = min(ops[-1].diag.shape)
        coarse_omega = 2.0 / (1.0 + math.sin(math.pi / n_coarse))
        # Default OFF: measured on v5e at 2048^2, the fused Pallas K-sweep
        # kernel runs at 0.157 ms/sweep vs 0.138 for XLA's fusion of the
        # compressed-code sweep -- both are VMEM-bandwidth-bound per pass
        # (~9 plane reads), so fusing K sweeps per HBM trip buys nothing.
        # Kept selectable for experimentation + interpret-mode validation.
        if use_pallas is None:
            use_pallas = False
        # The fused V-cycle level kernels looked like a win per-kernel but
        # LOSE end-to-end: measured on v5e at 2048x1024 cylinder, the full
        # step runs 4.76 ms/step fused vs 4.21 unfused. The per-call
        # _mg_pad_planes glue (padded copies of p/b/diag/code/e, then
        # unpad slices) adds ~4-5 extra HBM passes per level per cycle --
        # the same failure mode as the retired 2D predictor pre-padding.
        # Default OFF until the kernels carry an internal padded layout
        # across the V-cycle like the 3D whole-step path does; kept
        # selectable for experimentation + interpret-mode validation.
        if fused is None:
            fused = False
        return MGPoissonSolver(
            grid=grid, ops=ops, pre=pre, post=post,
            coarse_iters=coarse_iters, coarse_omega=coarse_omega,
            use_pallas=use_pallas, fused=fused,
        )

    # -- one V-cycle (statically unrolled over levels) ----------------------

    def _smooth(
        self, level: int, x: Array, b: Array, n: int, omega: float = None,
        ctx=None,
    ) -> Array:
        # fori_loop, NOT a Python loop: unrolled sweeps (esp. the coarse
        # solve) blow the XLA graph up enough that CPU compiles of the
        # enclosing scan hang for an hour+. A rolled loop compiles in seconds
        # and runs identically.
        op = self.ops[level]
        omega = self.omega if omega is None else omega
        if self.use_pallas and n <= 8 and ctx is None and op.ap is None:
            from . import pallas_kernels

            if pallas_kernels.rb_sweeps_applicable(
                op.diag.shape, op.diag.dtype
            ):
                return pallas_kernels.rb_sweeps(op, x, b, omega, n)
        return jax.lax.fori_loop(
            0, n, lambda i, p: _rb_sweep(op, p, b, omega, ctx=ctx), x
        )

    def _fused_ok(self, level: int) -> bool:
        if not self.fused or level == len(self.ops) - 1:
            return False
        if self.ops[level].ap is not None:
            return False  # apertured couplings: jnp sweeps only
        if not (1 <= self.pre <= 8 and 1 <= self.post <= 8):
            return False
        from . import pallas_kernels

        return pallas_kernels.mg_fused_applicable(self.ops[level])

    def _v_cycle(
        self, level: int, x: Array, b: Array, want_rsq: bool = False,
        ctx=None, split: int = 0,
    ):
        """One V-cycle at ``level``. With ``want_rsq`` also returns
        sum(((b - A x')*fluid)^2) of the RETURNED iterate -- the solve
        loop's convergence quantity (free on the fused path: K2 emits it
        as per-stripe partials).

        Under a ShardCtx (explicit-comm distributed mode, parallel/halo.py)
        levels < ``split`` run on block-local arrays with ppermute ghost
        exchanges inside the smoother/operator and psum'd norms; deeper
        levels run replicated (all_gather'd at the split boundary,
        identical redundant compute on every device, local re-slice on the
        way back up). ONE implementation either way (ctx=None is exactly
        the single-device math) -- VERDICT r1 item 4's no-forked-semantics
        rule, extended to the V-cycle."""
        op = self.ops[level]
        sharded = ctx is not None and level < split
        lctx = ctx if sharded else None
        if level == len(self.ops) - 1:
            x = self._smooth(
                level, x, b, self.coarse_iters, self.coarse_omega, ctx=lctx
            )
            if want_rsq:
                rn = residual_norm(op, x, b, lctx)
                return x, rn * rn
            return x
        if self._fused_ok(level) and ctx is None:
            from . import pallas_kernels

            x, r = pallas_kernels.mg_pre_sweeps_residual(
                op, x, b, self.pre, self.omega, interpret=self.interpret
            )
            rc = _restrict(r) * self.ops[level + 1].fluid
            ec = self._v_cycle(level + 1, jnp.zeros_like(rc), rc)
            e = _prolong(ec, op.periodic)
            x, rsq = pallas_kernels.mg_add_post_sweeps(
                op, x, b, e, self.post, self.omega, interpret=self.interpret
            )
            return (x, rsq) if want_rsq else x
        x = self._smooth(level, x, b, self.pre, ctx=lctx)
        r = (b - apply_A(op, x, lctx)) * op.fluid
        if sharded and level + 1 == split:
            # split boundary: assemble the full residual on every device;
            # the subtree below runs replicated. Restrict locally first
            # when the local block is even (half the gathered bytes);
            # gather the fine residual when it is odd (children pairs
            # straddle the shard boundary -- the reason the split is here).
            loc_even = all(
                r.shape[a] % 2 == 0
                for a in range(r.ndim) if ctx.sharded(a)
            )
            rc = (_gather_full(_restrict(r), ctx) if loc_even
                  else _restrict(_gather_full(r, ctx)))
        else:
            rc = _restrict(r)
        rc = rc * self.ops[level + 1].fluid
        ec = jnp.zeros_like(rc)
        ec = self._v_cycle(level + 1, ec, rc, ctx=ctx, split=split)
        if sharded and level + 1 == split:
            e = _slice_local(_prolong(ec, op.periodic), ctx)
        else:
            e = _prolong(ec, op.periodic, ctx=lctx)
        x = (x + e) * op.fluid
        x = self._smooth(level, x, b, self.post, ctx=lctx)
        if want_rsq:
            rn = residual_norm(op, x, b, lctx)
            return x, rn * rn
        return x

    def solve(
        self, b: Array, p0: Array, tol: float, max_cycles: int,
        ctx=None, split: int = 0,
    ) -> tuple[Array, Array, Array]:
        """Returns (p, cycles, relative residual) -- same semantics as
        ops/poisson.solve_poisson. ``ctx``/``split``: explicit-comm
        distributed mode (see _v_cycle)."""
        op = self.ops[0]
        dt = b.dtype
        b = b * op.fluid
        b = deflate(op, b, ctx) if op.singular else b
        p0 = p0 * op.fluid
        bsq = jnp.sum(b * b)
        if ctx is not None:
            bsq = ctx.psum(bsq)
        bnorm = jnp.sqrt(bsq)
        tiny = jnp.asarray(np.finfo(np.float32).tiny, dt)
        inv_bnorm = 1.0 / jnp.maximum(bnorm, tiny)
        tol = jnp.asarray(tol, dt)

        def cond(carry):
            p, k, res, prev = carry
            # Stop on convergence, the cycle cap, or stagnation: a healthy
            # V-cycle contracts the residual ~10x per cycle, so res stuck
            # above 0.9*prev means the float32 residual floor was hit and
            # further cycles are wasted work (at 2048^2 the floor for rough
            # RHS sits near 1e-4 relative -- below any reachable tol).
            improving = res < 0.9 * prev
            return jnp.logical_and(
                jnp.logical_and(k < max_cycles, res > tol), improving
            )

        def body(carry):
            p, k, res, _ = carry
            # want_rsq: on the fused-kernel path the final post-smooth
            # emits sum(r^2) per stripe, so the stopping check costs no
            # extra HBM pass. Deflation does not perturb it: A maps
            # constants to zero on the singular (all-Neumann) operator,
            # so the residual of the deflated iterate is identical.
            p, rsq = self._v_cycle(0, p, b, want_rsq=True,
                                   ctx=ctx, split=split)
            if op.singular:
                p = deflate(op, p, ctx)
            new_res = jnp.sqrt(rsq) * inv_bnorm
            return p, k + 1, new_res, res

        res0 = residual_norm(op, p0, b, ctx) * inv_bnorm
        inf = jnp.asarray(np.inf, res0.dtype)
        p, cycles, res, _ = jax.lax.while_loop(
            cond, body, (p0, jnp.int32(0), res0, inf)
        )
        return p, cycles, res

    # -- multigrid-preconditioned flexible CG --------------------------------

    def solve_pcg(
        self, b: Array, p0: Array, tol: float, max_iters: int,
        ctx=None, split: int = 0,
    ) -> tuple[Array, Array, Array]:
        """Flexible CG with one V-cycle as the preconditioner per iteration.

        Runs on the negated system ``(-A) p = -b`` (SPD on the fluid
        subspace, constant mode deflated when singular), like
        ``ops.poisson._solve_cg``; the preconditioner application is
        ``z = -V(0, r)`` (a zero-guess V-cycle is linear in its RHS, so this
        approximates ``(-A)^{-1} r``). The V-cycle's RB pre/post smoothing is
        only approximately symmetric, hence the *flexible* (Polak-Ribiere)
        beta — standard PCG stalls on nonsymmetric preconditioners.

        Why this exists next to plain ``solve``: Krylov acceleration rides
        through the modes a truncated-hierarchy V-cycle contracts slowly
        (thin-channel obstacle topologies, outflow-Dirichlet corners) and
        keeps converging below the plain-MG stagnation floor. Same stopping
        semantics as every other solver here: relative L2 of ``b - A p``;
        iters are CG iterations (one V-cycle + one stencil matvec each).
        The CG loop itself is ops/poisson.flexible_pcg (shared with the
        DCT-preconditioned variant); only the preconditioner is MG's.
        """
        op = self.ops[0]

        def precond(r):
            # A is negative (semi-)definite and the V-cycle approximates
            # A^{-1}; for the negated system z ~ (-A)^{-1} r = -(A^{-1} r).
            z = -self._v_cycle(0, jnp.zeros_like(r), r, ctx=ctx, split=split)
            return deflate(op, z, ctx) if op.singular else z * op.fluid

        return flexible_pcg(op, b, p0, tol, max_iters, precond, ctx=ctx)
