"""Time-integrator tests: the RK2 (midpoint, projection-per-stage) option
against explicit Euler (SURVEY.md SS0.3 parks the reference's integrator
order as unknown; both are offered).

Order measurement by self-convergence in TIME: errors are measured against
a tiny-dt reference run on the SAME grid, so the (identical) spatial error
cancels and the dt-refinement ratio isolates the temporal order:
~2x for Euler (first order), ~4x for RK2 (second order)."""

import jax.numpy as jnp
import numpy as np

from navierstokessolver_tpu.cases import make_case


def _run(integrator, dt, n_steps, shape=(16, 16), re=5.0):
    case = make_case("taylor_green", shape=shape, re=re, dt=dt,
                     integrator=integrator)
    st = case.initial_state()
    st, _ = case.sim.run_scan(st, n_steps)
    return st


def _err(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y))) for x, y in zip(a.u, b.u)
    )


def test_rk2_is_second_order_in_time():
    # Re=5 makes the decay rate 2*nu = 0.4 per time unit, so the temporal
    # error at dt=0.08 sits well above the f32 roundoff floor (at Re=100
    # Taylor-Green is temporally too easy: even Euler's error is ~1e-6).
    t_end = 0.4
    ref = _run("rk2", t_end / 80, 80)

    e_rk2 = [_err(_run("rk2", t_end / n, n), ref) for n in (5, 10)]
    ratio_rk2 = e_rk2[0] / e_rk2[1]
    assert ratio_rk2 > 3.2, (e_rk2, ratio_rk2)   # ~4 expected

    e_eul = [_err(_run("euler", t_end / n, n), ref) for n in (5, 10)]
    ratio_eul = e_eul[0] / e_eul[1]
    assert 1.6 < ratio_eul < 2.6, (e_eul, ratio_eul)  # ~2 expected

    # at equal dt, RK2's temporal error is far below Euler's
    assert e_rk2[0] < 0.2 * e_eul[0], (e_rk2[0], e_eul[0])


def test_rk2_cavity_matches_euler_steady_state():
    """Steady states are integrator-independent: the Re=100 cavity reaches
    the same flow through either path (and rk2 exercises the non-fused
    two-stage projection on a wall-bounded domain)."""
    kw = dict(shape=(24, 24), re=100.0)
    c_e = make_case("cavity", integrator="euler", **kw)
    c_r = make_case("cavity", integrator="rk2", **kw)
    n = 1200
    s_e, d_e = c_e.sim.run_scan(c_e.initial_state(), n)
    s_r, d_r = c_r.sim.run_scan(c_r.initial_state(), n)
    np.testing.assert_allclose(
        np.asarray(s_r.u[0]), np.asarray(s_e.u[0]), atol=2e-3
    )
    assert float(d_r.max_div[-1]) < 5e-5
