"""Fused trailing-two-axes spectral transform for the 3D DCT chains.

The matmul-mode transform chain (ops/fft_poisson.DCTPoissonSolver._fwd/
_inv) applies one tensordot per axis, each a full HBM read+write pass: a
3D direct solve is 6 passes, a refined solve 12. The axis-1 and axis-2
transforms both act WITHIN each axis-0 slab, so this kernel fuses them:
one grid step loads a (T, n1, n2) slab into VMEM, runs
``M1 @ x[r] @ M2^T`` per row on the MXU (optionally scaled by the
spectral multiplier in the epilogue), and writes once -- the two
trailing-axis passes (and the eigenvalue multiply) become ONE pass.
A chain becomes 4 passes (axis-0 matmul, fused trailing fwd, axis-0
inverse, fused trailing inv); measured numbers in docs/PARITY.md.

Runs in NATURAL axis order with dense per-axis matrices (the same
``_axis_matrices`` materialization the explicit-halo dctcg path uses)
and the natural-order spectral multiplier; the chain route keeps the
reversed block-order layout. Both compute the same operator to f32
noise (parity-tested in interpret mode).

Reference scope: SURVEY.md SS2 "pressure Poisson" row -- this is a
TPU-native optimization of the rebuild's own spectral solver; the
reference class has no spectral solve at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, prec):
    """f32 matmul at the requested MXU precision. Mosaic lowers DEFAULT
    (one bf16 pass) natively but not HIGH; HIGH is implemented here as
    the standard 3-pass bf16 split-product (a_hi b_hi + a_hi b_lo +
    a_lo b_hi) -- the same decomposition XLA's HIGH uses."""
    if prec == jax.lax.Precision.DEFAULT:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    assert prec == jax.lax.Precision.HIGH, prec
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _kernel(x_ref, m1_ref, m2t_ref, o_ref, *, T: int, prec, scaled: bool,
            eig_ref=None):
    m1 = m1_ref[...]
    m2t = m2t_ref[...]
    for r in range(T):
        y = _dot(m1, x_ref[r], prec)
        z = _dot(y, m2t, prec)
        if scaled:
            z = z * eig_ref[r]
        o_ref[r] = z


def fused_trailing(x: Array, m1: Array, m2: Array, eig=None,
                   precision=jax.lax.Precision.HIGH, tile: int = 8,
                   interpret: bool = False) -> Array:
    """``out[i] = (m1 @ x[i] @ m2.T) * (eig[i] if given)`` over axis-0
    slabs of ``x`` (n0, n1, n2), one HBM pass: per-tile VMEM residency
    for both matmuls and the multiplier epilogue.

    ``m1``: (k1, n1), ``m2``: (k2, n2) -- square for the DCT/circulant
    bases used here. Requires n0 % tile == 0 (production transform
    extents are powers of two).
    """
    n0, n1, n2 = x.shape
    k1, k2 = m1.shape[0], m2.shape[0]
    assert n0 % tile == 0, (n0, tile)
    assert m1.shape[1] == n1 and m2.shape[1] == n2, (m1.shape, m2.shape)
    kern_args = [x, m1, m2.T]
    in_specs = [
        pl.BlockSpec((tile, n1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((k1, n1), lambda i: (0, 0)),
        pl.BlockSpec((n2, k2), lambda i: (0, 0)),
    ]
    scaled = eig is not None
    if scaled:
        kern_args.append(eig)
        in_specs.append(pl.BlockSpec((tile, k1, k2), lambda i: (i, 0, 0)))

    def body(*refs):
        if scaled:
            x_ref, m1_ref, m2t_ref, eig_ref, o_ref = refs
        else:
            x_ref, m1_ref, m2t_ref, o_ref = refs
            eig_ref = None
        _kernel(x_ref, m1_ref, m2t_ref, o_ref, T=tile, prec=precision,
                scaled=scaled, eig_ref=eig_ref)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n0, k1, k2), x.dtype),
        grid=(n0 // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k1, k2), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*kern_args)


def direct_applicable(shape, dtype, tile: int = 8) -> bool:
    """Shape/dtype gate for the fused 3D direct-solve route: slab tiles
    must divide axis 0 and the in-kernel matmul operands need
    TPU-friendly trailing dims (production transform extents 128..512)."""
    if len(shape) != 3 or dtype != jnp.float32:
        return False
    n0, n1, n2 = shape
    # plane cap: (tile, n1, n2) f32 blocks must fit Mosaic's 16MB scoped
    # VMEM twice (in + out) plus the matrices -- 512-wide planes OOM
    return (n0 % tile == 0 and n1 % 8 == 0 and n2 % 128 == 0
            and n1 * n2 <= 256 * 256)
