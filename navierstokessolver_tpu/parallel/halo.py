"""Explicit halo-exchange Poisson solve: shard_map + ppermute over ICI.

SURVEY.md SS5: "the halo exchange IS the ring (neighbor ppermute over ICI)".
The GSPMD path (sharding.py) lets XLA insert halo collectives automatically;
this module is the hand-written equivalent for the hottest distributed loop
-- the pressure relaxation/CG iteration -- with the communication explicit:

  * 1D slab decomposition along grid axis 0 (mesh axis ``sx``);
  * per iteration, each device ppermutes its boundary rows to its neighbors
    (unlisted ring ends receive zeros; boundary cells have their coupling
    bits cleared in the stencil code, so the ghost content there is
    multiplied by zero -- no special casing at domain walls);
  * the operator travels as the compressed uint8 stencil code + f32 diagonal
    (ops/poisson.py representation): 2 sharded operands instead of 8, and the
    bandwidth-bound sweeps stream a quarter of the bytes;
  * red-black parity is synthesized from iota plus the shard's global row
    offset (``axis_index * local_rows``), never streamed;
  * global reductions (residual norms, CG dots, nullspace deflation) are
    ``lax.psum`` over the mesh axis;
  * the whole while_loop runs inside one shard_map'd program: every device
    evaluates the same psum'd predicate, so control flow stays lockstep with
    zero host round-trips.

Methods: jacobi (damped), rb (red-black GS/SOR), cg.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..grid import GridSpec
from ..ops.poisson import FLUID_BIT, PoissonConfig, PoissonOp

Array = jax.Array
AXIS = "sx"


def _halo_ghosts(x: Array, axis_name: str = AXIS):
    """Return (left_ghost, right_ghost) rows from the ring neighbors."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[:1])
        return z, z
    left = jax.lax.ppermute(
        x[-1:], axis_name, [(k, k + 1) for k in range(n - 1)]
    )
    right = jax.lax.ppermute(
        x[:1], axis_name, [(k, k - 1) for k in range(1, n)]
    )
    return left, right


def _neighbor_sum_local(p: Array, code: Array, w: tuple[float, ...]) -> Array:
    """Local block of ``sum_d c_d p_nb`` with ppermute halos along axis 0,
    couplings decoded from the stencil code."""
    nd = p.ndim
    zero = jnp.zeros((), p.dtype)

    def coupled(axis: int, side: int, nb: Array) -> Array:
        bit = 1 << (2 * axis + side)
        return jnp.where((code & bit) > 0, nb, zero)

    gl, gr = _halo_ghosts(p)
    pad = jnp.concatenate([gl, p, gr], axis=0)
    out = w[0] * (coupled(0, 0, pad[:-2]) + coupled(0, 1, pad[2:]))
    for a in range(1, nd):
        cfg_lo = [(0, 0)] * nd
        cfg_lo[a] = (1, 0)
        cfg_hi = [(0, 0)] * nd
        cfg_hi[a] = (0, 1)
        sl_lo = [slice(None)] * nd
        sl_lo[a] = slice(0, -1)
        sl_hi = [slice(None)] * nd
        sl_hi[a] = slice(1, None)
        p_lo = jnp.pad(p, cfg_lo)[tuple(sl_lo)]
        p_hi = jnp.pad(p, cfg_hi)[tuple(sl_hi)]
        out = out + w[a] * (coupled(a, 0, p_lo) + coupled(a, 1, p_hi))
    return out


def _psum(x, axis_name: str = AXIS):
    return jax.lax.psum(x, axis_name)


@dataclasses.dataclass(eq=False)
class ShardedPoissonSolver:
    """Distributed pressure solve over a 1D device ring."""

    grid: GridSpec
    mesh: Mesh
    op: PoissonOp
    cfg: PoissonConfig
    _solve_jit: object = None

    @staticmethod
    def build(
        grid: GridSpec, op: PoissonOp, mesh: Mesh, cfg: PoissonConfig
    ) -> "ShardedPoissonSolver":
        if mesh.axis_names[0] != AXIS or len(mesh.axis_names) != 1:
            raise ValueError("ShardedPoissonSolver needs a 1D ('sx',) mesh")
        if any(op.periodic):
            raise NotImplementedError(
                "periodic axes are not wired into the explicit halo-exchange "
                "solver yet (needs wraparound ppermute ring ends); use the "
                "GSPMD path (parallel/sharding.py), which handles them"
            )
        n_dev = mesh.devices.shape[0]
        if grid.shape[0] % n_dev:
            raise ValueError(
                f"grid axis 0 ({grid.shape[0]}) must divide over "
                f"{n_dev} devices"
            )
        self = ShardedPoissonSolver(grid=grid, mesh=mesh, op=op, cfg=cfg)
        nd = grid.ndim
        spec = P(AXIS, *([None] * (nd - 1)))
        rep = P()

        local_rows = grid.shape[0] // n_dev
        w = op.w
        inv_count = op.inv_fluid_count
        singular = op.singular
        cfg_ = cfg
        omega = 1.0
        if cfg.method == "sor":
            from ..ops.poisson import _auto_omega

            omega = cfg.omega if cfg.omega is not None else _auto_omega(grid)

        def deflate(x, fluid):
            if not singular:
                return x
            mean = _psum(jnp.sum(x * fluid)) * inv_count
            return (x - mean) * fluid

        def rnorm(p, b, diag, code, fluid):
            r = (b - (diag * p + _neighbor_sum_local(p, code, w))) * fluid
            return jnp.sqrt(_psum(jnp.sum(r * r)))

        def body_fn(b, p0, diag, code):
            fluid = ((code >> FLUID_BIT) & 1).astype(b.dtype)
            b = deflate(b * fluid, fluid) if singular else b * fluid
            bnorm = jnp.sqrt(_psum(jnp.sum(b * b)))
            tiny = jnp.asarray(np.finfo(np.float32).tiny, b.dtype)
            inv_bnorm = 1.0 / jnp.maximum(bnorm, tiny)
            tol = jnp.asarray(cfg_.tol, b.dtype)

            if cfg_.method == "cg":
                def matvec(x):
                    ax = -(diag * x + _neighbor_sum_local(x, code, w)) * fluid
                    return deflate(ax, fluid) if singular else ax

                bb = -b
                r0 = (bb - matvec(p0)) * fluid
                r0 = deflate(r0, fluid) if singular else r0
                rs0 = _psum(jnp.sum(r0 * r0))

                def cond(c):
                    p, r, d, rs, k = c
                    return jnp.logical_and(
                        k < cfg_.max_iters, jnp.sqrt(rs) * inv_bnorm > tol
                    )

                def it(c):
                    p, r, d, rs, k = c
                    Ad = matvec(d)
                    alpha = rs / jnp.maximum(
                        _psum(jnp.sum(d * Ad)), jnp.asarray(1e-30, b.dtype)
                    )
                    p = p + alpha * d
                    r = r - alpha * Ad
                    rs_new = _psum(jnp.sum(r * r))
                    beta = rs_new / jnp.maximum(rs, jnp.asarray(1e-30, b.dtype))
                    return p, r, r + beta * d, rs_new, k + 1

                p, r, d, rs, k = jax.lax.while_loop(
                    cond, it, (p0 * fluid, r0, r0, rs0, jnp.int32(0))
                )
                if singular:
                    p = deflate(p, fluid)
                return p, k, jnp.sqrt(rs) * inv_bnorm

            # relaxation methods: global red-black parity from iota + the
            # shard's global row offset.
            wgt = cfg_.jacobi_weight if cfg_.method == "jacobi" else omega
            offset = jax.lax.axis_index(AXIS).astype(jnp.int32) * local_rows
            idx_sum = sum(
                jax.lax.broadcasted_iota(jnp.int32, b.shape, d)
                for d in range(nd)
            )
            red = (idx_sum + offset) % 2 == 0

            def sweep(p):
                if cfg_.method == "jacobi":
                    p_new = (b - _neighbor_sum_local(p, code, w)) / diag
                    if wgt != 1.0:
                        p_new = (1.0 - wgt) * p + wgt * p_new
                    return p_new * fluid
                for is_red in (True, False):
                    color = red if is_red else jnp.logical_not(red)
                    gs = (b - _neighbor_sum_local(p, code, w)) / diag
                    p_new = (1.0 - wgt) * p + wgt * gs
                    p = jnp.where(color, p_new, p) * fluid
                return p

            def cond(c):
                p, k, res = c
                return jnp.logical_and(k < cfg_.max_iters, res > tol)

            def it(c):
                p, k, _ = c
                p = sweep(p)
                if singular:
                    p = deflate(p, fluid)
                return p, k + 1, rnorm(p, b, diag, code, fluid) * inv_bnorm

            res0 = rnorm(p0, b, diag, code, fluid) * inv_bnorm
            return jax.lax.while_loop(cond, it, (p0 * fluid, jnp.int32(0), res0))

        mapped = jax.shard_map(
            body_fn,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, rep, rep),
        )
        self._solve_jit = jax.jit(
            lambda b, p0: mapped(b, p0, op.diag, op.code)
        )
        return self

    def solve(self, b: Array, p0: Array):
        """Returns (p, iters, relative residual), p sharded over the ring."""
        return self._solve_jit(b, p0)
