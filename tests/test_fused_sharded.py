"""Sharded fused whole-step (VERDICT r1 item 3, completion): the internal-
layout predictor+RHS / corrector+diag kernels under shard_map with per-step
ppermute ghost refresh, validated in interpret mode on the virtual CPU mesh
against the single-device jnp trajectory."""

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

# Heavy tier (VERDICT r3 item 1): interpret-mode kernel-parity file,
# measured 649s cold on the 1-core box (scripts/time_tests.py). Excluded
# from the default quick suite; run `pytest -m heavy` before commits
# touching the fused kernels or sharded tiers.
pytestmark = pytest.mark.heavy

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _sharded_pallas(sim, mesh):
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    return sharded_simulation(sim_p, mesh)


@requires_8
@pytest.mark.parametrize("method", ["mg", "fft"])
def test_sharded_fused_step_matches_unsharded(method):
    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     poisson_method=method)
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 10)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 10)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p), atol=5e-4)
    # diagnostics agree (not just the fields)
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=1e-6
    )
    assert abs(float(d.max_div[-1]) - float(dref.max_div[-1])) < 1e-5
    assert len(out.p.sharding.device_set) == 4


@requires_8
def test_sharded_fused_step_two_shards_long_scan():
    """Longer scan on 2 shards: the carried ghost slots stay consistent
    across many refresh cycles; trajectory still tracks single-device."""
    case = make_case("cavity3d", shape=(16, 16, 16), re=100.0)
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 40)
    mesh = make_mesh(2)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 40
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=1e-4
        )
    assert np.isfinite(np.asarray(d.max_div)).all()


@requires_8
def test_sharded_fused_with_extrapolation():
    case = make_case("cavity3d", shape=(16, 16, 16), re=100.0,
                     poisson_method="cg", poisson_extrapolate=0.8)
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 15)
    mesh = make_mesh(2)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 15
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    assert out.p_prev is not None


@requires_8
def test_sharded_fused_gate():
    case = make_case("cavity3d", shape=(16, 16, 16), re=100.0)
    sim = case.sim
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    # 2D pencil mesh: the pencil whole-step tier covers it (round 3)
    sim_2d = sharded_simulation(sim_p, make_mesh((2, 2)))
    assert sim_2d._fused3d_sharded_ok()
    # degenerate pencil (local sublanes < 8) falls back to the
    # per-component sharded predictor
    sim_24 = sharded_simulation(sim_p, make_mesh((2, 4)))
    assert not sim_24._fused3d_sharded_ok()
    assert sim_24._pallas_ok()
    # degenerate slab (local rows < 8)
    sim_8 = sharded_simulation(sim_p, make_mesh(8))
    assert not sim_8._fused3d_sharded_ok()


@requires_8
def test_sharded_fused_with_explicit_halo_poisson():
    """The fully-explicit multi-chip path: shard_map fused kernels around a
    shard_map ppermute-CG pressure solve (poisson_comm='halo')."""
    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     poisson_method="cg", poisson_tol=1e-6,
                     poisson_iters=20000)
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 10)
    mesh = make_mesh(4)
    params = dataclasses.replace(sim.params, use_pallas=True)
    sim_p = dataclasses.replace(sim, params=params, pallas_interpret=True)
    sim_sp = sharded_simulation(sim_p, mesh, poisson_comm="halo")
    assert sim_sp._fused3d_sharded_ok() and sim_sp.halo_solver is not None
    out, _ = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 10
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
def test_sharded_fused_periodic_ring_matches_unsharded():
    """Periodic sharded axis 0 (taylor_green3d on a 4-way slab mesh): the
    ppermute ghost rings CLOSE with wraparound links and no shard is an
    edge; trajectory matches the single-device run."""
    case = make_case("taylor_green3d", shape=(32, 16, 16), re=400.0)
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 10)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 10
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    assert abs(float(d.max_div[-1]) - float(dref.max_div[-1])) < 1e-5


@requires_8
def test_sharded_fused_duct_forcing_matches_unsharded():
    """Periodic ring + static scalar forcing (the duct) through the
    sharded fused path."""
    case = make_case("duct_periodic", shape=(32, 8, 8),
                     lengths=(4.0, 1.0, 1.0))
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 10)
    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 10
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
def test_sharded_fused_thermal_matches_unsharded():
    """Sharded fused thermal step (heated cavity 3D on a 4-way slab mesh):
    theta's axis-0 ghosts ride their own ppermute exchange, buoyancy is
    transverse to the sharded axis; u, p AND theta match single-device."""
    case = make_case("heated_cavity", shape=(32, 8, 8), ra=1e4)
    sim = case.sim
    assert sim.scalar is not None
    ref, _ = sim.run_scan(case.initial_state(), 10)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(
        shard_state(case.initial_state(), mesh, sim.grid), 10
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5
    )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)


@requires_8
def test_sharded_fused_scalar_sim_without_theta():
    """Review regression: a scalar-configured sim stepped from a
    theta-less State runs the sharded fused path without the scalar."""
    import jax.numpy as jnp
    from navierstokessolver_tpu.grid import State

    case = make_case("heated_cavity", shape=(32, 8, 8), ra=1e4)
    sim = case.sim
    g = sim.grid
    st = State(
        u=tuple(jnp.zeros(g.face_shape(a), jnp.float32) for a in range(3)),
        p=jnp.zeros(g.shape, jnp.float32),
    )
    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(shard_state(st, mesh, g), 3)
    assert out.theta is None
    assert np.isfinite(np.asarray(d.max_div)).all()


@requires_8
def test_sharded_fused_rk2_matches_unsharded():
    """VERDICT r2 item 3: rk2 through the SHARDED fused whole-step -- both
    stages fused, the stage-2 base (step-start) field streams through the
    same ppermute ghost refresh as the midpoint field."""
    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0,
                     integrator="rk2")
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_array_equal(
        np.asarray(d.poisson_iters), np.asarray(dref.poisson_iters)
    )
    assert len(out.p.sharding.device_set) == 4


@requires_8
def test_sharded_fused_cfl_adaptive_matches_unsharded():
    """CFL-adaptive dt through the sharded fused path: the corrector's
    global velocity pmax rides the scan carry and sets the next dt."""
    case = make_case("cavity3d", shape=(32, 16, 16), re=100.0, cfl=0.3)
    sim = case.sim
    assert sim.params.cfl is not None
    ref, dref = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    # per-step dt sequences must agree (the CFL carry is the new machinery)
    np.testing.assert_allclose(np.asarray(d.dt), np.asarray(dref.dt),
                               rtol=1e-6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
@pytest.mark.parametrize("method", ["mg", "fft"])
def test_pencil_fused_step_matches_unsharded(method):
    """VERDICT r2 item 3 (second half): the fused whole-step on a 2D
    ('sx','sy') PENCIL mesh -- axis-1 ghost columns ride sy-ppermutes and
    the kernels run in halo1 mode (roll-based sublane ghosts)."""
    case = make_case("cavity3d", shape=(16, 32, 16), re=100.0,
                     poisson_method=method)
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 10)

    mesh = make_mesh((2, 4))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 10)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=1e-6
    )
    assert abs(float(d.max_div[-1]) - float(dref.max_div[-1])) < 1e-5
    assert len(out.p.sharding.device_set) == 8


@requires_8
def test_pencil_fused_periodic_ring_matches_unsharded():
    """Fully periodic box on a pencil mesh: BOTH ppermute rings close
    (wraparound links along sx AND sy)."""
    case = make_case("taylor_green3d", shape=(16, 32, 16), re=400.0)
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh((2, 4))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    assert float(d.max_div[-1]) < 5e-4


@requires_8
def test_pencil_fused_duct_forcing_matches_unsharded():
    """Static body forcing + mixed periodic/wall BCs through the pencil
    tier (axis-0 periodic ring + wall-bounded sharded axis 1)."""
    case = make_case("duct_periodic", shape=(16, 16, 8))
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh((2, 2))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
def test_pencil_fused_rk2_cfl_matches_unsharded():
    """rk2 + CFL-adaptive dt through the PENCIL tier: both stages fused,
    the stage-2 base field rides the two-stage (columns, then rows) ghost
    refresh; the corrector's velocity pmax over BOTH mesh axes sets dt."""
    case = make_case("cavity3d", shape=(16, 32, 16), re=100.0,
                     integrator="rk2", cfl=0.3)
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh((2, 4))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    np.testing.assert_allclose(np.asarray(d.dt), np.asarray(dref.dt),
                               rtol=1e-6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_array_equal(
        np.asarray(d.poisson_iters), np.asarray(dref.poisson_iters)
    )


@requires_8
def test_sharded_fused_obstacle_matches_unsharded():
    """Obstacle masks through the SHARDED fused whole-step (sphere:
    inflow + axis-0 outflow + interior solid on a 4-way slab mesh): the
    static per-shard uint8 code blocks stream through the halo-mode
    kernels with NO per-step code exchange; trajectory + diagnostics
    match the single-device jnp path."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.6,
                     poisson_method="mg")
    sim = case.sim
    assert sim.face_masks is not None          # the mask actually bites
    ref, dref = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=1e-6
    )
    assert abs(float(d.max_div[-1]) - float(dref.max_div[-1])) < 1e-5
    assert len(out.p.sharding.device_set) == 4


@requires_8
def test_sharded_fused_obstacle_gates():
    """Obstacles engage the sharded fused path on BOTH tiers (slab and
    pencil), euler AND rk2 -- the static code blocks stream through the
    kernels with no per-step exchange."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.6,
                     poisson_method="mg")
    sim = case.sim
    sim_rk2 = dataclasses.replace(
        sim, params=dataclasses.replace(sim.params, integrator="rk2")
    )
    assert _sharded_pallas(sim_rk2, make_mesh(4))._fused3d_sharded_ok()
    assert _sharded_pallas(sim, make_mesh((2, 2)))._fused3d_sharded_ok()
    assert _sharded_pallas(sim, make_mesh(4))._fused3d_sharded_ok()


@requires_8
@pytest.mark.parametrize("integrator", ["euler", "rk2"])
def test_pencil_fused_obstacle_matches_unsharded(integrator):
    """Obstacles through the PENCIL ('sx','sy') fused tier: the static
    per-shard code blocks carry the comp-1 shared-face COLUMN (and the
    comp-0 shared row) prefilled, so the in-register shared-face stars
    and corrections gate on the true global codes; trajectory matches
    the single-device jnp path."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.8,
                     poisson_method="mg", integrator=integrator)
    sim = case.sim
    assert sim.face_masks is not None
    ref, dref = sim.run_scan(case.initial_state(), 6)

    mesh = make_mesh((2, 2))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_allclose(
        # 5e-6: the two-axis pmax reorders the f32 reduction vs jnp
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=5e-6
    )
    assert abs(float(d.max_div[-1]) - float(dref.max_div[-1])) < 1e-5
    assert len(out.p.sharding.device_set) == 4


@requires_8
@pytest.mark.parametrize("integrator,mesh_shape", [
    ("euler", 4), ("rk2", 4), ("euler", (2, 2)), ("rk2", (2, 2)),
])
def test_sharded_fused_forcing_fields_match_unsharded(integrator,
                                                      mesh_shape):
    """Spatially-varying per-face forcing volumes through the SHARDED
    fused whole-step (Kolmogorov flow, fully periodic -> ring mode):
    the per-shard blocks (forcing_to_halo / forcing_to_pencil, shared-
    face row/column prefilled) stream through the forced operand set
    with no per-step exchange; trajectory matches single-device jnp.
    The (2,2) cases exercise the PENCIL tier (the forcing varies along
    the sy-sharded axis, so the seam blocks actually differ)."""
    case = make_case("kolmogorov", shape=(32, 16, 16), re=5.0,
                     k_forcing=2, integrator=integrator)
    sim = case.sim
    assert sim.forcing is not None and sim._static_forcing() is None
    ref, dref = sim.run_scan(case.initial_state(), 6)

    mesh = make_mesh(mesh_shape)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=1e-6
    )
    assert len(out.p.sharding.device_set) == 4


@requires_8
def test_sharded_fused_obstacle_rk2_matches_unsharded():
    """RK2 + obstacles through the SHARDED fused whole-step: both stages
    stream the static per-shard code blocks (stage 2 via the based-mode
    predictor); trajectory matches the single-device jnp rk2 branch."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.6,
                     poisson_method="mg", integrator="rk2")
    sim = case.sim
    ref, dref = sim.run_scan(case.initial_state(), 6)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4)
    np.testing.assert_array_equal(
        np.asarray(d.poisson_iters), np.asarray(dref.poisson_iters)
    )


@requires_8
def test_pencil_fused_thermal_matches_unsharded():
    """Heated cavity through the PENCIL tier: theta's ghost slots ride
    both refresh stages; buoyancy is transverse to both sharded axes."""
    case = make_case("heated_cavity", shape=(16, 16, 8), ra=1e4)
    sim = case.sim
    assert sim.scalar is not None
    ref, _ = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh((2, 2))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5
    )


@requires_8
def test_sharded_fused_thermal_outflow_face_exact():
    """Scalar transport + axis-0 HI OUTFLOW under sharding: the last
    shard's outflow face takes the zero-gradient copy of the CORRECTED
    inner face in-kernel (a pre-correction copy leaked a growing theta
    error at the outlet row before round 3), so theta matches the
    single-device jnp trajectory to roundoff."""
    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.scalar import ScalarBC, ScalarConfig
    from navierstokessolver_tpu.solver import (
        PoissonConfig, SimParams, Simulation,
    )

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 0)] = BCSpec.inflow((1.0, 0.0, 0.0))
    bcs[(0, 1)] = BCSpec.outflow()
    scfg = ScalarConfig(
        bcs={(a, s): (ScalarBC.dirichlet(1.0) if (a, s) == (1, 0)
                      else ScalarBC.adiabatic())
             for a in range(3) for s in (0, 1)},
        diffusivity=5e-3, upwind_gamma=0.2,
    )
    params = SimParams(
        dt=2e-3, nu=5e-3, upwind_gamma=0.2,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=60),
    )
    sim = Simulation.build(g, bcs, params, scalar=scfg)
    ref, _ = sim.run_scan(sim.initial_state(), 16)
    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(
        shard_state(sim.initial_state(), mesh, sim.grid), 16
    )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-7
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=1e-6
        )


@requires_8
def test_sharded_fused_heated_obstacle_matches_unsharded():
    """Scalar + obstacle through the SHARDED fused whole-step (round 4,
    VERDICT r3 item 4): heated sphere in crossflow (isothermal body,
    passive theta, axis-0 outflow) on a 4-way slab mesh. The theta halo
    rides its own ppermute ring next to the static code blocks; the
    isothermal clamp applies on the sharded halo-layout theta."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.6,
                     poisson_method="mg", heated=True)
    sim = case.sim
    assert sim.face_masks is not None and sim.scalar_solid is not None
    ref, dref = sim.run_scan(case.initial_state(), 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, d = sim_sp.run_scan(st, 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5
    )
    solid = np.asarray(sim.scalar_solid)
    assert np.all(np.asarray(out.theta)[solid] == 1.0)   # clamp held
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl), atol=1e-6
    )
    assert len(out.p.sharding.device_set) == 4


@requires_8
@pytest.mark.parametrize("integrator", ["euler", "rk2"])
def test_pencil_fused_buoyant_obstacle_matches_unsharded(integrator):
    """Natural convection around a hot body (heated_enclosure 3D) through
    the PENCIL fused tier: theta streams through the MASKED predictor for
    the Boussinesq force (buoyancy along the unsharded axis 2), the
    masked+thermal corrector advances it, and the clamp applies on the
    pencil-layout theta. euler AND rk2."""
    case = make_case("heated_enclosure", shape=(16, 16, 16), ra=1e4,
                     diameter=0.35, center=(0.5, 0.5, 0.45),
                     integrator=integrator)
    sim = case.sim
    ref, _ = sim.run_scan(case.initial_state(), 6)

    mesh = make_mesh((2, 2))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    st = shard_state(case.initial_state(), mesh, sim.grid)
    out, _ = sim_sp.run_scan(st, 6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5,
            err_msg=integrator,
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5,
        err_msg=integrator,
    )
    w = np.asarray(out.u[2])
    assert float(np.abs(w).max()) > 1e-5   # buoyancy actually acted


@requires_8
def test_sharded_fused_adiabatic_obstacle_matches_unsharded():
    """ADIABATIC body through the SHARDED fused step: the corrector's
    body_neumann gating closes the interface fluxes per shard (the
    FACE_OPEN bits ride the static code blocks); the solid interior keeps
    its seeded stratification, unclamped."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import BCSpec, no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.scalar import ScalarBC, ScalarConfig
    from navierstokessolver_tpu.solver import (
        PoissonConfig, SimParams, Simulation,
    )

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    bcs[(0, 1)] = BCSpec.wall((0.0, 0.4, 0.0))   # stirred end wall
    solid = np.zeros((32, 16, 16), bool)
    solid[14:20, 6:10, 6:10] = True
    scfg = ScalarConfig(
        bcs={(a, s): (ScalarBC.dirichlet(1.0) if (a, s) == (1, 0)
                      else ScalarBC.dirichlet(0.0) if (a, s) == (1, 1)
                      else ScalarBC.adiabatic())
             for a in range(3) for s in (0, 1)},
        diffusivity=2e-3,
        body_bc=ScalarBC.adiabatic(),
    )
    params = SimParams(
        dt=2e-3, nu=5e-3,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=60),
    )
    sim = Simulation.build(g, bcs, params, solid=solid, scalar=scfg)
    st = sim.initial_state()
    y = np.linspace(1.0, 0.0, 16)[None, :, None]
    th0 = jnp.asarray(np.broadcast_to(y, (32, 16, 16)), g.dtype)
    st = dataclasses.replace(st, theta=th0)
    ref, _ = sim.run_scan(st, 6)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(shard_state(st, mesh, sim.grid), 6)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=5e-5
    )
    th = np.asarray(out.theta)
    np.testing.assert_allclose(
        th[solid], np.asarray(th0)[solid], atol=1e-4
    )


@requires_8
@pytest.mark.parametrize("integrator", ["euler", "rk2"])
def test_sharded_fused_ibm_matches_unsharded(integrator):
    """Sharp-interface IBM through the SHARDED fused whole-step (round 4):
    per-shard halo-layout operand blocks, the direct forcing applied
    between the kernels with a ghost refresh on each side, the comp-0
    shared-face forcing delta exchanged for the RHS patch. Trajectory
    matches the single-device jnp path, euler AND rk2."""
    case = make_case(
        "sphere", shape=(32, 16, 16), lengths=(8.0, 4.0, 4.0),
        center=(2.0, 2.03, 1.97), re=100.0, poisson_method="mg",
        poisson_extrapolate=0.0, ibm=True, integrator=integrator,
    )
    sim = case.sim
    assert sim.ibm is not None and sim.ibm.fused_ok
    st0 = case.initial_state()
    ref, dref = sim.run_scan(st0, 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(shard_state(st0, mesh, sim.grid), 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5,
            err_msg=integrator,
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4, err_msg=integrator)
    np.testing.assert_array_equal(
        np.asarray(d.poisson_iters), np.asarray(dref.poisson_iters)
    )


@requires_8
def test_sharded_fused_moving_ibm_matches_unsharded():
    """MOVING body (rotating sphere) through the SHARDED fused step: the
    wet-face velocities ride the OPEN face codes per shard and the
    ub/wet operand blocks; trajectory matches single-device jnp."""
    import jax.numpy as jnp

    from navierstokessolver_tpu.bcs import no_slip_box
    from navierstokessolver_tpu.grid import GridSpec
    from navierstokessolver_tpu.ops.poisson import PoissonConfig
    from navierstokessolver_tpu.solver import SimParams, Simulation

    g = GridSpec(shape=(32, 16, 16), lengths=(2.0, 1.0, 1.0))
    bcs = no_slip_box(g)
    c = (1.0, 0.503, 0.497)
    r = 0.18
    om = 1.0
    sdf = lambda x, y, z: np.sqrt(            # noqa: E731
        (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) - r
    vel = lambda x, y, z: (                   # noqa: E731
        -om * (y - c[1]), om * (x - c[0]), np.zeros_like(z))
    params = SimParams(
        dt=2e-3, nu=5e-3,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=60,
                              extrapolate=0.0),
    )
    sim = Simulation.build(g, bcs, params, sdf=sdf, surface_velocity=vel)
    assert sim.ibm is not None and sim.ibm.wet is not None
    st0 = sim.initial_state()
    ref, _ = sim.run_scan(st0, 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(shard_state(st0, mesh, sim.grid), 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )
    # the spin actually moved fluid across shard boundaries
    assert float(np.abs(np.asarray(out.u[0])).max()) > 1e-4


@requires_8
def test_pencil_fused_ibm_matches_unsharded():
    """IBM through the PENCIL fused tier: operand blocks with zero ghost
    slots along BOTH axes; the comp-0 shared-row AND comp-1 shared-column
    forcing deltas ride sy/sx ppermutes for the RHS patch."""
    case = make_case(
        "sphere", shape=(32, 16, 16), lengths=(8.0, 4.0, 4.0),
        center=(2.0, 2.03, 1.97), re=100.0, poisson_method="mg",
        poisson_extrapolate=0.0, ibm=True,
    )
    sim = case.sim
    st0 = case.initial_state()
    ref, _ = sim.run_scan(st0, 8)

    mesh = make_mesh((2, 2))
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, _ = sim_sp.run_scan(shard_state(st0, mesh, sim.grid), 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5
        )


@requires_8
@pytest.mark.parametrize("integrator", ["euler", "rk2"])
def test_sharded_fused_convective_outlet_matches_unsharded(integrator):
    """Convective outlet through the SHARDED fused whole-step (round 4):
    the held face n0 rides the scan carry as one replicated plane; the
    transport update, rhs row b-1 recompute, and Dirichlet-ghost
    correction are last-shard wrapper fixups with the excluded
    diagnostics folded back. Trajectory + diagnostics match the
    single-device jnp path, euler AND rk2 (obstacle codes included)."""
    case = make_case("sphere", shape=(32, 16, 16), lengths=(16.0, 8.0, 8.0),
                     center=(4.0, 4.1, 3.9), diameter=1.6,
                     poisson_method="mg", outlet="convective",
                     integrator=integrator)
    sim = case.sim
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state

    st = impulsive_start_state(sim)
    ref, dref = sim.run_scan(st, 8)

    mesh = make_mesh(4)
    sim_sp = _sharded_pallas(sim, mesh)
    assert sim_sp._fused3d_sharded_ok()
    out, d = sim_sp.run_scan(shard_state(st, mesh, sim.grid), 8)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out.u[a]), np.asarray(ref.u[a]), atol=5e-5,
            err_msg=integrator,
        )
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=5e-4, err_msg=integrator)
    np.testing.assert_allclose(
        np.asarray(d.max_div), np.asarray(dref.max_div),
        rtol=1e-3, atol=1e-6, err_msg=integrator,
    )
    np.testing.assert_allclose(
        np.asarray(d.max_cfl), np.asarray(dref.max_cfl),
        rtol=1e-4, atol=1e-7, err_msg=integrator,
    )
    # the convective face transports (nonzero outlet velocity)
    assert float(np.abs(np.asarray(out.u[0])[-1]).max()) > 1e-3
