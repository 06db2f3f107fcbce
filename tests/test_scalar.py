"""Transported scalar + Boussinesq buoyancy (scalar.py).

Oracles: analytic diffusion decay, exact discrete conservation of the
flux-form advection in a closed box, and the de Vahl Davis (1983)
differentially-heated-cavity benchmark (published average Nusselt numbers).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokessolver_tpu import GridSpec
from navierstokessolver_tpu.bcs import no_slip_box
from navierstokessolver_tpu.cases import make_case
from navierstokessolver_tpu.cases.convection import hot_wall_nusselt
from navierstokessolver_tpu.ops.poisson import PoissonConfig
from navierstokessolver_tpu.scalar import (
    ScalarBC,
    ScalarConfig,
    scalar_rhs,
)
from navierstokessolver_tpu.solver import SimParams, Simulation


def _adiabatic_cfg(alpha, **kw):
    return ScalarConfig(
        bcs={(a, s): ScalarBC.adiabatic() for a in range(2) for s in (0, 1)},
        diffusivity=alpha,
        **kw,
    )


def test_pure_diffusion_decay():
    """Zero velocity: theta = cos(pi x) decays at exp(-alpha pi^2 t)
    (adiabatic/Neumann eigenmode of the box)."""
    g = GridSpec(shape=(64, 8), lengths=(1.0, 1.0))
    alpha = 0.05
    cfg = _adiabatic_cfg(alpha)
    x = (np.arange(64) + 0.5) / 64
    theta = jnp.asarray(
        np.broadcast_to(np.cos(np.pi * x)[:, None], (64, 8)), jnp.float32
    )
    u = tuple(jnp.zeros(g.face_shape(a), jnp.float32) for a in range(2))
    dt = 2e-4
    n = 500
    for _ in range(5):
        # small unrolled chunks inside jit via python loop is fine here
        pass
    import jax

    def body(th, _):
        return th + dt * scalar_rhs(g, cfg, u, th), None
    theta_n, _ = jax.lax.scan(body, theta, None, length=n)
    t = dt * n
    expected = math.exp(-alpha * math.pi**2 * t)
    ratio = float(theta_n[0, 0] / theta[0, 0])
    np.testing.assert_allclose(ratio, expected, rtol=2e-3)


def test_passive_scalar_conserved_in_closed_box():
    """Flux-form advection + adiabatic walls: sum(theta) is conserved to
    roundoff while the cavity flow stirs the scalar."""
    case = make_case("cavity", shape=(32, 32), re=100.0)
    sim0 = case.sim
    x = (np.arange(32) + 0.5) / 32
    blob = np.exp(-((x[:, None] - 0.3) ** 2 + (x[None, :] - 0.5) ** 2) / 0.02)
    cfg = _adiabatic_cfg(
        alpha := 1e-3, theta_init=blob.astype(np.float32),
        upwind_gamma=0.0,
    )
    sim = Simulation.build(sim0.grid, sim0.bcs, sim0.params, scalar=cfg)
    st = sim.initial_state()
    total0 = float(jnp.sum(st.theta))
    st, d = sim.run_scan(st, 400)
    total = float(jnp.sum(st.theta))
    assert np.isfinite(np.asarray(st.theta)).all()
    np.testing.assert_allclose(total, total0, rtol=1e-5)
    # the flow actually moved the scalar
    assert float(jnp.max(jnp.abs(st.theta - jnp.asarray(blob)))) > 1e-3


def test_de_vahl_davis_ra1e3():
    """Natural convection benchmark: average hot-wall Nusselt number at
    Ra=1e3 is 1.118 (de Vahl Davis 1983). 32^2, t=12: within 2%."""
    case = make_case("heated_cavity", shape=(32, 32), ra=1e3)
    sim = case.sim
    st = case.initial_state()
    n = int(round(12.0 / sim.params.dt))
    st, d = sim.run_scan(st, n)
    nu = hot_wall_nusselt(sim, st.theta)
    assert abs(nu - 1.118) / 1.118 < 0.02, nu
    assert float(d.max_div[-1]) < 1e-5
    # buoyancy actually drives a flow (u_max ~ 0.14 in these units)
    assert float(jnp.max(jnp.abs(st.u[0]))) > 0.05


def test_scalar_checkpoint_roundtrip(tmp_path):
    from navierstokessolver_tpu import io as io_mod

    case = make_case("heated_cavity", shape=(16, 16), ra=1e3)
    sim = case.sim
    st = case.initial_state()
    st, _ = sim.run_scan(st, 20)
    path = str(tmp_path / "ckpt.npz")
    h = io_mod.config_hash(sim.grid, sim.params, sim.scalar)
    io_mod.save_checkpoint(path, st, 20, h)
    st2, step = io_mod.load_checkpoint(path, sim.grid, h, expect_scalar=True)
    assert step == 20
    np.testing.assert_array_equal(np.asarray(st2.theta), np.asarray(st.theta))
    # resumed run continues identically
    a, _ = sim.run_scan(st, 10)
    b, _ = sim.run_scan(st2, 10)
    np.testing.assert_allclose(
        np.asarray(a.theta), np.asarray(b.theta), atol=1e-7
    )


def test_checkpoint_scalar_and_integrator_guards(tmp_path):
    """ADVICE r1: resuming must not silently change physics.

    (a) config_hash distinguishes integrator and scalar-on/off configs;
    (b) a theta-less checkpoint refuses to resume into a scalar-enabled sim.
    """
    import dataclasses

    from navierstokessolver_tpu import io as io_mod

    plain = make_case("cavity", shape=(16, 16))
    heated = make_case("heated_cavity", shape=(16, 16), ra=1e3)

    h_plain = io_mod.config_hash(plain.sim.grid, plain.sim.params)
    h_rk2 = io_mod.config_hash(
        plain.sim.grid,
        dataclasses.replace(plain.sim.params, integrator="rk2"),
    )
    assert h_plain != h_rk2
    h_scalar = io_mod.config_hash(
        heated.sim.grid, heated.sim.params, heated.sim.scalar
    )
    h_noscalar = io_mod.config_hash(heated.sim.grid, heated.sim.params)
    assert h_scalar != h_noscalar

    # Save a theta-less checkpoint, try to resume it as a scalar run.
    st = plain.initial_state()
    path = str(tmp_path / "plain.npz")
    io_mod.save_checkpoint(path, st, 0, h_plain)
    with pytest.raises(ValueError, match="no theta"):
        io_mod.load_checkpoint(path, plain.sim.grid, expect_scalar=True)


def test_rayleigh_benard_criticality():
    """Linear-stability oracle: the rigid-rigid critical Rayleigh number is
    1708. A seeded perturbation decays to the conductive state at Ra=800
    and grows into convection rolls at Ra=5000 (kinetic energies separated
    by many orders of magnitude)."""
    def kinetic_at(ra, t_end=30.0):
        case = make_case("rayleigh_benard", shape=(48, 24), ra=ra)
        sim = case.sim
        st = case.initial_state()
        n = int(round(t_end / sim.params.dt))
        st, d = sim.run_scan(st, n)
        assert float(d.max_div[-1]) < 1e-5
        return sum(float(jnp.sum(c * c)) for c in st.u)

    e_sub = kinetic_at(800.0)
    e_super = kinetic_at(5000.0)
    assert e_sub < 1e-5, e_sub            # decayed to conduction
    assert e_super > 1.0, e_super         # saturated convection rolls


def test_heated_cavity_3d_smoke():
    """The convection subsystem is dimension-generic: a 3D differentially
    heated cavity develops a buoyant circulation with a clean projection."""
    case = make_case("heated_cavity", shape=(16, 16, 16), ra=1e4)
    sim = case.sim
    st = case.initial_state()
    st, d = sim.run_scan(st, 150)
    th = np.asarray(st.theta)
    assert th.shape == (16, 16, 16)
    assert np.isfinite(th).all() and -0.01 <= th.min() and th.max() <= 1.01
    # buoyancy drives vertical motion (last axis) near the hot wall
    assert float(jnp.max(jnp.abs(st.u[2]))) > 1e-2
    assert float(d.max_div[-1]) < 1e-5


# -- scalar + immersed obstacle (body_bc) ------------------------------------


def test_body_bc_required_with_obstacle():
    """scalar + solid mask without body_bc is wrong physics (diffusion
    through the body) -- build() refuses it loudly."""
    case = make_case("cylinder", shape=(64, 32), re=20.0,
                     poisson_method="mg")
    sim0 = case.sim
    cfg = _adiabatic_cfg(1e-2)
    import re as re_mod

    solid = np.zeros((64, 32), bool)
    solid[28:36, 12:20] = True
    with pytest.raises(ValueError, match=re_mod.escape("body_bc")):
        Simulation.build(sim0.grid, sim0.bcs, sim0.params, solid=solid,
                         scalar=cfg)


def test_adiabatic_body_conserves_and_freezes():
    """Insulated block in a stirred cavity: every fluid-solid diffusive
    flux is closed and the advective interface fluxes are zero (masked
    velocity), so sum(theta) stays exactly conserved; the (meaningless)
    solid-cell values are frozen."""
    case = make_case("cavity", shape=(32, 32), re=100.0,
                     poisson_method="mg")
    sim0 = case.sim
    x = (np.arange(32) + 0.5) / 32
    blob = np.exp(-((x[:, None] - 0.25) ** 2
                    + (x[None, :] - 0.6) ** 2) / 0.02)
    cfg = _adiabatic_cfg(
        5e-3, theta_init=blob.astype(np.float32),
        body_bc=ScalarBC.adiabatic(),
    )
    solid = np.zeros((32, 32), bool)
    solid[14:20, 14:20] = True
    sim = Simulation.build(sim0.grid, sim0.bcs, sim0.params, solid=solid,
                           scalar=cfg)
    st = sim.initial_state()
    total0 = float(jnp.sum(st.theta))
    frozen0 = np.asarray(st.theta)[solid]
    st, d = sim.run_scan(st, 300)
    th = np.asarray(st.theta)
    assert np.isfinite(th).all()
    np.testing.assert_allclose(float(jnp.sum(st.theta)), total0, rtol=1e-5)
    np.testing.assert_array_equal(th[solid], frozen0)
    # the stirred fluid did change
    assert np.max(np.abs(th - blob)) > 1e-3


def test_isothermal_body_steady_profile_and_flux():
    """Pure diffusion between a cold wall (theta=0 Dirichlet at x=0) and a
    hot solid slab (body theta=1 occupying x > 0.75): the exact discrete
    steady state is LINEAR through cell centers from 0 at the wall to 1 at
    the first solid cell center, and body_heat_flux equals the analytic
    alpha * A / x_s."""
    nx, ny = 32, 8
    g = GridSpec(shape=(nx, ny), lengths=(1.0, 0.25))
    bcs = no_slip_box(g)
    alpha = 0.1
    cfg = ScalarConfig(
        bcs={
            (0, 0): ScalarBC.dirichlet(0.0),
            (0, 1): ScalarBC.adiabatic(),
            (1, 0): ScalarBC.adiabatic(),
            (1, 1): ScalarBC.adiabatic(),
        },
        diffusivity=alpha,
        body_bc=ScalarBC.dirichlet(1.0),
    )
    solid = np.zeros((nx, ny), bool)
    k = 24
    solid[k:, :] = True
    params = SimParams(
        dt=2e-3, nu=1e-2,
        poisson=PoissonConfig(method="mg", tol=1e-6, max_iters=50),
    )
    sim = Simulation.build(g, bcs, params, solid=solid, scalar=cfg)
    st = sim.initial_state()
    # isothermal clamp applied from step 0
    np.testing.assert_array_equal(np.asarray(st.theta)[solid], 1.0)
    st, d = sim.run_scan(st, 4000)     # t = 8 >> L^2/alpha ~ 3.1
    th = np.asarray(st.theta)
    h = 1.0 / nx
    x_s = (k + 0.5) * h                # first solid cell center
    x = (np.arange(k) + 0.5) * h
    expected = x / x_s
    np.testing.assert_allclose(th[:k, 3], expected, atol=2e-3)
    from navierstokessolver_tpu.scalar import body_heat_flux

    q = float(body_heat_flux(g, cfg, st.theta, jnp.asarray(solid)))
    hy = 0.25 / ny
    a_interface = ny * hy              # total interface length
    q_exact = alpha * a_interface / x_s
    np.testing.assert_allclose(q, q_exact, rtol=5e-3)


def test_heated_cylinder_smoke():
    """Forced convection from an isothermal cylinder: bounded temperature,
    clamped body, positive heat flux into the stream."""
    case = make_case("heated_cylinder", shape=(64, 32), re=20.0,
                     poisson_method="mg")
    sim = case.sim
    assert sim.scalar_solid is not None
    st = sim.initial_state()
    st, d = sim.run_scan(st, 120)
    th = np.asarray(st.theta)
    solid = np.asarray(sim.scalar_solid)
    assert np.isfinite(th).all()
    assert th.min() >= -0.05 and th.max() <= 1.05
    np.testing.assert_array_equal(th[solid], 1.0)
    from navierstokessolver_tpu.scalar import body_heat_flux

    q = float(body_heat_flux(sim.grid, sim.scalar, st.theta,
                             sim.scalar_solid))
    assert q > 0.0
    # relative-L2 poisson tol on a 4-cells-per-diameter grid: the absolute
    # max-divergence floor is coarse here
    assert float(d.max_div[-1]) < 1e-2


def test_heated_enclosure_energy_balance():
    """Natural convection from a hot immersed cylinder in a cold box
    (scalar + obstacle + buoyancy together): at steady state the heat
    entering the fluid through the staircase body surface exactly
    balances the heat leaving through the cold Dirichlet walls, and
    convection carries more heat than conduction alone (Nu > Nu_cond)."""
    from navierstokessolver_tpu.cases.convection import wall_heat_flux
    from navierstokessolver_tpu.scalar import body_heat_flux

    # Ra = 1e6 on the enclosure side: gap-based Ra ~ 2.7e4, solidly in
    # the convective regime (at Ra_L = 1e4 the 0.3-gap annulus is
    # conduction-dominated and the enhancement assertion is vacuous)
    case = make_case("heated_enclosure", shape=(48, 48), ra=1e6, dt=4e-3)
    sim = case.sim
    import dataclasses

    sc0 = dataclasses.replace(sim.scalar, buoyancy=(0.0, 0.0))
    sim0 = Simulation.build(sim.grid, sim.bcs, sim.params, scalar=sc0,
                            solid=np.asarray(sim.scalar_solid))

    def to_flux_steady(s, state):
        # iterate until the body flux and the wall flux BALANCE (the
        # balance residual IS the distance from steady state: until the
        # stored-energy integral equilibrates, the body injects more
        # than the walls remove)
        q = d = None
        for _ in range(80):
            state, d = s.run_scan(state, 500)
            q = float(body_heat_flux(s.grid, s.scalar, state.theta,
                                     s.scalar_solid))
            qw = wall_heat_flux(s, state.theta)
            if abs(qw - q) < 8e-3 * abs(q):
                break
        return state, q, d

    st, q_body, d = to_flux_steady(sim, sim.initial_state())
    q_wall = wall_heat_flux(sim, st.theta)
    assert q_body > 0.0
    np.testing.assert_allclose(q_wall, q_body, rtol=1e-2)
    # convection actually enhances transport over pure conduction
    _, q_cond, _ = to_flux_steady(sim0, sim0.initial_state())
    assert q_body > 1.2 * q_cond, (q_body, q_cond)
    # the buoyant plume rises: theta above the body exceeds theta below
    th = np.asarray(st.theta)
    assert th[24, 38] > th[24, 9] + 0.05
    assert float(d.max_div[-1]) < 1e-4
