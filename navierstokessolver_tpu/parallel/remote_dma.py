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

Status: validated prototype, not yet the production path -- fusing the
exchange INTO the predictor/corrector kernels (start the sends from the
first/last stripe's epilogue, wait in the prologue of the next step's
first stripe) is the follow-up that buys actual overlap; as a standalone
kernel the DMA cost is the same as ppermute's, so production keeps the
jnp refresh until the fused variant is measured on real ICI.
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
