"""Kernel-initiated ICI ghost exchange for the slab-sharded fused step.

The sharded fused whole-step (parallel/fused_sharded.py) refreshes each
component's ghost slots with jnp-level ``lax.ppermute``s between kernel
invocations: XLA materializes the one/two-row messages, runs a collective-
permute, and the next kernel re-reads them from HBM. The TPU-native
endgame (SURVEY.md SS2 "pallas remote DMA later"; docs/SCALING.md names it
the planned next optimization) is to issue the transfers FROM a kernel as
async remote DMAs over ICI so they can overlap the stripe pipeline.

This module is the first rung: a Pallas kernel that performs the slab
tier's whole axis-0 ghost refresh -- row b-1 to the right neighbor's lo
ghost slot (row RP-1), rows [0, 2) to the left neighbor's hi ghost slots
(rows [b, b+2)) -- as paired ``pltpu.make_async_remote_copy`` calls with
send/recv semaphores, ring or bounded topology. It reproduces
``fused_sharded._refresh_ghosts``'s interior-link behavior exactly (edge
shards keep their pre-staged BC-synthesis slots untouched); correctness
is pinned against the ppermute path in TPU-interpret mode on the virtual
CPU mesh (tests/test_remote_dma.py), which emulates the inter-device DMAs
and their semaphore semantics (jax._src.pallas.mosaic.interpret).

Round 5 (VERDICT r4 item 2): the exchange surface is now COMPLETE and
BATCHED -- :func:`exchange_rows_multi` moves ANY static set of row
messages for ANY number of volumes in ONE kernel launch (all remote DMAs
in flight concurrently before any wait), and ``rdma=True`` covers every
jnp-level ppermute of the steady slab path: the 3-component velocity
ghost refresh (one launch, 6 DMAs), the predictor's corrected-shared-
face exchange, and the corrector's pressure halo fill. The steady
``rdma=True`` path issues ZERO ``lax.ppermute``s.

Why the sends are NOT yet issued from the predictor/corrector stripe
epilogues (the "full fusion" endgame): a Pallas semaphore's lifetime is
one ``pallas_call`` -- a send started in kernel A cannot be awaited in
kernel B, so cross-step overlap requires either folding the exchange
INTO the consumer kernel's prologue (processing interior stripes while
the edge messages fly -- a stripe-reorder surgery on the fused kernels)
or XLA-level async collective scheduling. Batching all messages into
one launch per phase is the portion of the overlap win expressible
today; the stripe-reorder variant only pays on real ICI, where it can
be measured (multi-chip hardware is unavailable this round -- the
virtual mesh time-slices one core and cannot show overlap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _exchange_kernel(x_hbm, out, copy_sem, send_sem, recv_sem, *, b: int,
                     RP: int, axis: str, n_dev: int, ring: bool):
    """Fill out's ghost slots from the neighbors' data rows via remote
    DMAs; pass the local rows through unchanged.

    Layout (fused_sharded halo mode): rows [0, b) = local data; rows
    b, b+1 = hi ghost slots (right link's rows 0, 1 -- BC-synthesis
    values pre-staged by the caller survive on the last shard); row
    RP-1 = lo ghost slot (left link's row b-1). Every write region is
    disjoint from every other (local copies never touch a slot a remote
    write targets), so there is no cross-device race.

    Descriptor symmetry (the ring-collective convention): every
    participating device builds the SAME remote-copy descriptor;
    ``wait_send`` blocks on the local send semaphore, ``wait_recv`` on
    the local receive semaphore -- gated separately so bounded (non-ring)
    edge shards skip the side they don't have.
    """
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    send_right = ring | (my < n_dev - 1)   # data flowing rightward
    recv_lo = ring | (my > 0)              # ... lands in MY row RP-1
    send_left = ring | (my > 0)            # data flowing leftward
    recv_hi = ring | (my < n_dev - 1)      # ... lands in MY rows b, b+1

    # my last data row -> right neighbor's lo ghost slot
    rdma_lo = pltpu.make_async_remote_copy(
        src_ref=x_hbm.at[pl.ds(b - 1, 1)],
        dst_ref=out.at[pl.ds(RP - 1, 1)],
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    # my first two data rows -> left neighbor's hi ghost slots
    rdma_hi = pltpu.make_async_remote_copy(
        src_ref=x_hbm.at[pl.ds(0, 2)],
        dst_ref=out.at[pl.ds(b, 2)],
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(send_right)
    def _():
        rdma_lo.start()

    @pl.when(send_left)
    def _():
        rdma_hi.start()

    # local pass-through of every row NOT remotely written, overlapping
    # the DMAs: data rows [0, b) always; the pad rows (b+2 .. RP-2)
    # always; the ghost slots only where no inbound message targets them
    # (edge shards keep the caller's staged BC rows).
    cp_data = pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, b)], out.at[pl.ds(0, b)], copy_sem.at[0]
    )
    cp_data.start()
    if RP - 1 > b + 2:
        cp_pad = pltpu.make_async_copy(
            x_hbm.at[pl.ds(b + 2, RP - 1 - (b + 2))],
            out.at[pl.ds(b + 2, RP - 1 - (b + 2))],
            copy_sem.at[1],
        )
        cp_pad.start()
        cp_pad.wait()
    cp_data.wait()

    @pl.when(jnp.logical_not(recv_hi))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(b, 2)], out.at[pl.ds(b, 2)], copy_sem.at[2]
        )
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_not(recv_lo))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(RP - 1, 1)], out.at[pl.ds(RP - 1, 1)],
            copy_sem.at[3],
        )
        cp.start()
        cp.wait()

    @pl.when(send_right)
    def _():
        rdma_lo.wait_send()

    @pl.when(recv_lo)
    def _():
        rdma_lo.wait_recv()

    @pl.when(send_left)
    def _():
        rdma_hi.wait_send()

    @pl.when(recv_hi)
    def _():
        rdma_hi.wait_recv()


def _exchange_rows_multi_kernel(*refs, msgs, RP: int, axis: str,
                                n_dev: int, ring: bool, n_vol: int):
    """Generalized multi-volume row exchange: for each input volume
    (rows [0, RP)), move the static message set ``msgs`` -- tuples
    ``(src_row, n_rows, dst_row, dir)`` with dir 'fwd' (to the right
    neighbor) / 'bwd' (to the left) -- as concurrent remote DMAs, and
    pass every row NOT targeted by an inbound message through unchanged
    (edge shards keep the caller's staged BC/zero slots). ALL sends
    start before ANY wait, so the messages of every volume overlap."""
    xs = refs[:n_vol]
    outs = refs[n_vol:2 * n_vol]
    copy_sem, send_sem, recv_sem = refs[2 * n_vol:]
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    started = []
    for c in range(n_vol):
        for m, (src, n, dst, d) in enumerate(msgs):
            fwd = d == "fwd"
            target = right if fwd else left
            send_ok = ring | ((my < n_dev - 1) if fwd else (my > 0))
            recv_ok = ring | ((my > 0) if fwd else (my < n_dev - 1))
            rdma = pltpu.make_async_remote_copy(
                src_ref=xs[c].at[pl.ds(src, n)],
                dst_ref=outs[c].at[pl.ds(dst, n)],
                send_sem=send_sem.at[c, m],
                recv_sem=recv_sem.at[c, m],
                device_id=target,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

            @pl.when(send_ok)
            def _(rdma=rdma):
                rdma.start()

            started.append((rdma, send_ok, recv_ok, c, (dst, n)))

    # local pass-through of the complement of the dst ranges, plus the
    # dst ranges themselves where no inbound message targets them
    dsts = sorted((d0, d0 + n) for (_, n, d0, _) in msgs)
    gaps = list(_gaps(dsts, RP))
    si = 0
    pend = []
    for c in range(n_vol):
        for start, n in gaps:
            cp = pltpu.make_async_copy(
                xs[c].at[pl.ds(start, n)], outs[c].at[pl.ds(start, n)],
                copy_sem.at[si],
            )
            cp.start()
            pend.append(cp)
            si += 1
    for cp in pend:
        cp.wait()
    for rdma, send_ok, recv_ok, c, (dst, n) in started:
        @pl.when(jnp.logical_not(recv_ok))
        def _(c=c, dst=dst, n=n, si=si):
            cp = pltpu.make_async_copy(
                xs[c].at[pl.ds(dst, n)], outs[c].at[pl.ds(dst, n)],
                copy_sem.at[si],
            )
            cp.start()
            cp.wait()

        si += 1
    for rdma, send_ok, recv_ok, _c, _dn in started:
        @pl.when(send_ok)
        def _(rdma=rdma):
            rdma.wait_send()

        @pl.when(recv_ok)
        def _(rdma=rdma):
            rdma.wait_recv()


def exchange_rows_multi(xs, msgs, axis: str, n_dev: int,
                        ring: bool = False, interpret=False):
    """One kernel launch moving ``msgs`` for every volume in ``xs``
    (tuple of (RP, S, L) local blocks -- S/L may differ per volume).
    ``msgs``: static tuple of ``(src_row, n_rows, dst_row, 'fwd'|'bwd')``
    with non-overlapping dst ranges. Returns the refreshed volumes.
    Edge shards of a bounded (non-ring) topology keep the input's dst
    slot contents, so jnp-staged BC/zero rows survive."""
    xs = tuple(xs)
    n_vol = len(xs)
    RP = xs[0].shape[0]
    assert all(x.shape[0] == RP for x in xs)
    msgs = tuple((int(s), int(n), int(d), dr) for (s, n, d, dr) in msgs)
    dsts = sorted((d, d + n) for (_, n, d, _) in msgs)
    for (a0, a1), (b0, _) in zip(dsts, dsts[1:]):
        assert a1 <= b0, f"overlapping dst ranges {dsts}"
    n_gaps = sum(1 for _ in _gaps(dsts, RP))
    n_copy = n_vol * (n_gaps + len(msgs))
    kern = functools.partial(
        _exchange_rows_multi_kernel, msgs=msgs, RP=RP, axis=axis,
        n_dev=n_dev, ring=ring, n_vol=n_vol,
    )
    out = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_vol,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * n_vol),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(n_copy, 1),)),
            pltpu.SemaphoreType.DMA((n_vol, len(msgs))),
            pltpu.SemaphoreType.DMA((n_vol, len(msgs))),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=0),
        interpret=interpret,
    )(*xs)
    return tuple(out) if isinstance(out, (list, tuple)) else (out,)


def _gaps(dsts, RP):
    pos = 0
    for lo, hi in dsts:
        if lo > pos:
            yield (pos, lo - pos)
        pos = max(pos, hi)
    if pos < RP:
        yield (pos, RP - pos)


def exchange_ghost_rows(x: Array, b: int, axis: str, n_dev: int,
                        ring: bool = False,
                        interpret=False) -> Array:
    """Per-shard (inside shard_map over ``axis``) axis-0 ghost refresh of
    one halo-layout volume via kernel-initiated remote DMAs.

    ``x``: (RP, S, L) local block, rows [0, b) data. Returns x with row
    RP-1 = left link's row b-1 and rows [b, b+2) = right link's rows
    [0, 2) (interior links; edge shards keep the input's slot contents,
    so the caller's jnp BC synthesis staged there survives).

    ``interpret``: pass ``pltpu.InterpretParams()`` on a CPU backend to
    run under the TPU interpret machinery, which emulates the remote
    DMAs + semaphores across the virtual devices.
    """
    RP = x.shape[0]
    kern = functools.partial(
        _exchange_kernel, b=b, RP=RP, axis=axis, n_dev=n_dev, ring=ring
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=0),
        interpret=interpret,
    )(x)
