"""Time-dependent BC values / forcing through the SHARDED fused tiers
(round 5, VERDICT r4 item 3): the scan carries t, resolves the callables
per step, and streams the traced values into the shard_map bodies as one
replicated vector; stored Dirichlet planes refresh on the global halo
arrays. Parity target = the single-device jnp timedep scan.

Split from test_fused_sharded.py: one interpret-mode kernel-parity FILE
per worker keeps each process under the XLA-CPU cumulative-compile crash
threshold documented in pytest.ini.
"""

import dataclasses

import jax
import numpy as np
import pytest

from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.parallel import (
    make_mesh,
    shard_state,
    sharded_simulation,
)

pytestmark = pytest.mark.heavy

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _sharded_pallas(sim, mesh):
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    return sharded_simulation(sim_p, mesh)


# ---------------------------------------------------------------------------
# Time-dependent BC VALUES through the sharded fused tiers (round 5,
# VERDICT r4 item 3): the scan carries t, resolves the callables per step,
# and streams the traced values into the shard_map bodies as one
# replicated vector; stored Dirichlet planes refresh on the global halo
# arrays. Parity target = the single-device jnp timedep scan.
# ---------------------------------------------------------------------------


def _timedep_lid_sim(shape, integrator="euler", cfl=None, lid_axis=2):
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=shape, lengths=(1.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    # lid on the hi face of ``lid_axis``, sliding in x (tangential for
    # axes 1/2); traced value = cos(2 pi t)
    bcs[(lid_axis, 1)] = BCSpec.wall(
        (lambda t: jnp.cos(2.0 * jnp.pi * t), 0.0, 0.0)
    )
    params = SimParams(
        dt=2e-3, nu=0.01, integrator=integrator, cfl=cfl,
        poisson=PoissonConfig(method="cg", tol=1e-7, max_iters=600),
    )
    return Simulation.build(g, bcs, params)


def _timedep_parity(sim, mesh, n_steps=6, atol_u=5e-5):
    ref, dref = sim.run_scan(sim.initial_state(), n_steps)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_timedep_ok(), "timedep sharded gate"
    st = shard_state(sim.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, n_steps)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=atol_u
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_allclose(float(out.t), float(ref.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.dt), np.asarray(dref.dt),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d.max_div), np.asarray(dref.max_div),
        rtol=1e-3, atol=1e-5,
    )


@requires_8
@pytest.mark.parametrize("integrator,cfl", [("euler", None), ("rk2", 0.4)])
def test_sharded_fused_timedep_oscillating_lid(integrator, cfl):
    """Oscillating lid (tangential traced value) through the SLAB fused
    tier: euler fixed-dt and rk2 + CFL-adaptive dt (the per-step dt
    comes from the refreshed layout, matching the jnp post-BC
    reduction)."""
    sim = _timedep_lid_sim((32, 16, 16), integrator=integrator, cfl=cfl)
    _timedep_parity(sim, make_mesh(4))


@requires_8
def test_sharded_fused_timedep_normal_inflow():
    """Pulsatile INFLOW normal value on the SHARDED axis lo face: the
    stored comp-0 row-0 plane must refresh per step (shard 0 only), with
    zero-gradient outflow at the hi face."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 0)] = BCSpec.inflow(
        (lambda t: 0.5 + 0.3 * jnp.sin(8.0 * t), 0.0, 0.0)
    )
    bcs[(0, 1)] = BCSpec.outflow()
    params = SimParams(
        dt=2e-3, nu=0.02,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=80),
    )
    sim = Simulation.build(g, bcs, params)
    _timedep_parity(sim, make_mesh(4), n_steps=6)


@requires_8
def test_pencil_fused_timedep_oscillating_lid():
    """Oscillating lid through the PENCIL ('sx','sy') fused tier: both
    sharded axes exchange ghosts around the per-step resolved values."""
    sim = _timedep_lid_sim((16, 16, 16), integrator="euler")
    _timedep_parity(sim, make_mesh((2, 2)))


@requires_8
def test_sharded_fused_timedep_thermal():
    """Scalar transport + buoyancy + an oscillating lid through the
    sharded timedep fused tier (the gate admits thermal; this pins it):
    theta rides the carry with static scalar BCs while the velocity BC
    values resolve per step."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.scalar import ScalarBC, ScalarConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(2, 1)] = BCSpec.wall((lambda t: jnp.cos(4.0 * t), 0.0, 0.0))
    scfg = ScalarConfig(
        bcs={(0, 0): ScalarBC.dirichlet(1.0),
             (0, 1): ScalarBC.dirichlet(0.0),
             **{(a, s): ScalarBC.adiabatic()
                for a in (1, 2) for s in (0, 1)}},
        diffusivity=5e-3,
        buoyancy=(0.0, 0.0, 0.5),   # transverse to the sharded axis
    )
    params = SimParams(
        dt=2e-3, nu=0.01,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=80),
    )
    sim = Simulation.build(g, bcs, params, scalar=scfg)
    ref, _ = sim.run_scan(sim.initial_state(), 6)
    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_timedep_ok()
    out, d = sim_sp.run_scan(
        shard_state(sim.initial_state(), mesh, sim.grid), 6
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5
    )
    np.testing.assert_allclose(float(out.t), float(ref.t), rtol=1e-6)


@requires_8
def test_sharded_fused_timedep_forcing():
    """Callable body FORCING through the sharded timedep fused tier
    (round 5): the per-step resolved force packs to per-shard halo
    blocks inside the scan. Forcing-only (static BCs) AND mixed
    (oscillating lid + pulsing force) both match the single-device jnp
    timedep run."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    prof = jnp.asarray(
        np.cos(2.0 * np.pi * (np.arange(16) + 0.5) / 16.0)[None, :, None],
        jnp.float32,
    )
    forcing = (lambda t: (0.05 * jnp.sin(8.0 * t) + 0.02) * prof,
               None, None)
    params = SimParams(
        dt=2e-3, nu=0.01,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=80),
    )
    mesh = make_mesh(4)

    for tag, bcs in (
        ("forcing-only", no_slip_box(g)),
        ("mixed", {**no_slip_box(g),
                   (2, 1): BCSpec.wall(
                       (lambda t: 0.3 * jnp.cos(4.0 * t), 0.0, 0.0))}),
    ):
        sim = Simulation.build(g, bcs, params, forcing=forcing)
        assert sim._time_dependent()
        ref, _ = sim.run_scan(sim.initial_state(), 6)
        sim_sp = _sharded_pallas(sim, mesh)
        assert sim_sp._fused3d_sharded_timedep_ok(), tag
        out, d = sim_sp.run_scan(
            shard_state(sim.initial_state(), mesh, sim.grid), 6
        )
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5,
                err_msg=tag,
            )
        np.testing.assert_allclose(float(out.t), float(ref.t), rtol=1e-6)
        # the force actually drove flow
        assert float(np.abs(np.asarray(out.u[0])).max()) > 1e-4, tag


@requires_8
def test_sharded_fused_timedep_halo_poisson():
    """Timedep sharded fused tier + the EXPLICIT-halo Poisson solve
    (poisson_comm='halo'): the per-step resolved kernels wrap around the
    shard_map mg ring exactly like the static tier."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(2, 1)] = BCSpec.wall((lambda t: jnp.cos(4.0 * t), 0.0, 0.0))
    params = SimParams(
        dt=2e-3, nu=0.01,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=80),
    )
    sim = Simulation.build(g, bcs, params)
    ref, _ = sim.run_scan(sim.initial_state(), 4)
    mesh = make_mesh(4)
    simp = dataclasses.replace(
        sim, params=dataclasses.replace(params, use_pallas=True),
        pallas_interpret=True,
    )
    sh = sharded_simulation(simp, mesh, poisson_comm="halo")
    assert sh._fused3d_sharded_timedep_ok()
    out, _ = sh.run_scan(shard_state(sim.initial_state(), mesh, g), 4)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(float(out.t), float(ref.t), rtol=1e-6)
