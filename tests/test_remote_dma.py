"""Kernel-initiated remote-DMA ghost exchange (parallel/remote_dma.py --
VERDICT r3 item 7 prototype): the slab tier's axis-0 ghost refresh as
paired ``pltpu.make_async_remote_copy`` calls, validated in TPU-interpret
mode on the virtual CPU mesh (the interpret machinery emulates the
inter-device DMAs and their semaphore semantics, including the race
detector's vector clocks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from navierstokessolver_tpu.parallel.remote_dma import exchange_ghost_rows

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@requires_8
@pytest.mark.parametrize("ring", [False, True])
def test_exchange_matches_neighbor_rows(ring):
    """Each shard's ghost slots receive exactly the neighbor rows the
    ppermute refresh would deliver; edge shards (bounded topology) keep
    their pre-staged slot contents."""
    from jax.experimental.pallas import tpu as pltpu

    n_dev, b, RP, S, L = 4, 8, 16, 8, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_dev * RP, S, L)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sx",))
    fn = jax.shard_map(
        lambda xb: exchange_ghost_rows(
            xb, b, "sx", n_dev, ring, interpret=pltpu.InterpretParams()
        ),
        mesh=mesh, in_specs=P("sx"), out_specs=P("sx"), check_vma=False,
    )
    out = np.asarray(jax.jit(fn)(x))
    xb = np.asarray(x).reshape(n_dev, RP, S, L)
    ob = out.reshape(n_dev, RP, S, L)
    for k in range(n_dev):
        exp = xb[k].copy()
        if ring or k > 0:
            exp[RP - 1] = xb[(k - 1) % n_dev][b - 1]
        if ring or k < n_dev - 1:
            exp[b:b + 2] = xb[(k + 1) % n_dev][0:2]
        np.testing.assert_array_equal(ob[k], exp, err_msg=f"shard {k}")


@requires_8
def test_sharded_fused_step_rdma_matches_ppermute():
    """Full sharded fused whole-step with the remote-DMA velocity ghost
    refresh == the ppermute refresh == the single-device jnp trajectory
    (slab mesh, cavity)."""
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.parallel import make_mesh, shard_state
    from navierstokessolver_tpu.parallel.fused_sharded import (
        run_scan_sharded_fused,
    )

    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     poisson_method="mg")
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 5)

    mesh = make_mesh(4)
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    from navierstokessolver_tpu.parallel import sharded_simulation

    sim_sp = sharded_simulation(sim_p, mesh)
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, _ = run_scan_sharded_fused(sim_sp, mesh, st, 5, rdma=True)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
def test_rdma_steady_path_has_zero_ppermutes():
    """VERDICT r4 item 2 done-criterion: with rdma=True the steady slab
    path issues ZERO jnp-level ppermutes -- the velocity ghost refresh
    (one 6-DMA launch), the predictor's corrected-shared-face exchange,
    and the corrector's pressure halo fill are all kernel-initiated
    remote DMAs. Checked on the traced step's jaxpr."""
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.parallel import (
        make_mesh, shard_state, sharded_simulation,
    )
    from navierstokessolver_tpu.parallel.fused_sharded import (
        make_sharded_fused_step, to_internal_halo,
    )

    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     poisson_method="mg")
    sim = case.sim
    mesh = make_mesh(4)
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    sim_sp = sharded_simulation(sim_p, mesh)
    step_rdma = make_sharded_fused_step(sim_sp, mesh, rdma=True)
    step_pp = make_sharded_fused_step(sim_sp, mesh, rdma=False)
    st = shard_state(case.initial_state(), mesh, sim.grid)
    iu = to_internal_halo(sim.grid, st.u, mesh)
    carry = (iu, st.p, None, st.p_prev, jnp.zeros((), jnp.float32))
    jaxpr_rdma = str(jax.make_jaxpr(lambda c: step_rdma(c))(carry))
    jaxpr_pp = str(jax.make_jaxpr(lambda c: step_pp(c))(carry))
    assert "ppermute" in jaxpr_pp          # the baseline really uses them
    assert "ppermute" not in jaxpr_rdma    # the rdma path uses none


@requires_8
@pytest.mark.parametrize("ring", [False, True])
def test_exchange_rows_multi_generic_msgs(ring):
    """The generalized multi-volume exchange (round 5): two volumes of
    different widths, a custom message set (one fwd single-row, one bwd
    single-row at distinct slots) -- each shard's dst slots receive
    exactly the neighbor rows, untargeted rows pass through, bounded
    edges keep staged contents."""
    from jax.experimental.pallas import tpu as pltpu

    from navierstokessolver_tpu.parallel.remote_dma import (
        exchange_rows_multi,
    )

    n_dev, RP = 4, 12
    b = 8
    msgs = ((b - 1, 1, RP - 1, "fwd"), (0, 1, b, "bwd"))
    rng = np.random.default_rng(3)
    xs = [
        jnp.asarray(rng.standard_normal((n_dev * RP, 8, 128)), jnp.float32),
        jnp.asarray(rng.standard_normal((n_dev * RP, 16, 128)), jnp.float32),
    ]
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sx",))
    fn = jax.shard_map(
        lambda a, c: exchange_rows_multi(
            (a, c), msgs, "sx", n_dev, ring,
            interpret=pltpu.InterpretParams(),
        ),
        mesh=mesh, in_specs=(P("sx"), P("sx")),
        out_specs=(P("sx"), P("sx")), check_vma=False,
    )
    outs = jax.jit(fn)(*xs)
    for x, out in zip(xs, outs):
        xb = np.asarray(x).reshape(n_dev, RP, *x.shape[1:])
        ob = np.asarray(out).reshape(n_dev, RP, *x.shape[1:])
        for k in range(n_dev):
            exp = xb[k].copy()
            if ring or k > 0:
                exp[RP - 1] = xb[(k - 1) % n_dev][b - 1]
            if ring or k < n_dev - 1:
                exp[b] = xb[(k + 1) % n_dev][0]
            np.testing.assert_array_equal(ob[k], exp, err_msg=f"shard {k}")


@requires_8
def test_rdma_via_public_sharded_simulation():
    """rdma is a first-class option: sharded_simulation(rdma=True) routes
    run_scan through the remote-DMA exchanges (and silently ignores the
    flag where the slab fused tier doesn't dispatch)."""
    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.parallel import (
        make_mesh, shard_state, sharded_simulation,
    )

    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     poisson_method="mg")
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 4)
    mesh = make_mesh(4)
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    sim_sp = sharded_simulation(sim_p, mesh, rdma=True)
    assert sim_sp.rdma
    out, _ = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 4
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
