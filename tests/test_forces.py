"""Control-volume force diagnostics (utils/forces.py) -- fast tests.

The slow physics oracle (cylinder Cd bracket) lives in test_oracles.py;
these validate the rank-generic cv_terms_nd against the audited 2D
discretization and 3D uniform-flow sanity.
"""
def test_cv_terms_nd_matches_2d():
    """The rank-generic control-volume terms reproduce the hand-unrolled 2D
    discretization slice-for-slice on a random (divergent, irregular)
    field -- the 3D path then rests on the same audited stencils."""
    import jax.numpy as jnp
    import numpy as np

    from navierstokessolver_tpu import GridSpec
    from navierstokessolver_tpu.grid import State
    from navierstokessolver_tpu.utils.forces import cv_terms, cv_terms_nd

    rng = np.random.default_rng(11)
    g = GridSpec(shape=(24, 20), lengths=(1.2, 1.0))
    st = State(
        u=(jnp.asarray(rng.normal(size=g.face_shape(0)), jnp.float32),
           jnp.asarray(rng.normal(size=g.face_shape(1)), jnp.float32)),
        p=jnp.asarray(rng.normal(size=g.shape), jnp.float32),
    )
    box = (5, 17, 4, 15)
    sfx, sfy, mx, my = cv_terms(g, st, 0.02, box)
    sf, mom = cv_terms_nd(g, st, 0.02, box)
    np.testing.assert_allclose(float(sf[0]), float(sfx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(sf[1]), float(sfy), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mom[0]), float(mx), rtol=1e-6)
    np.testing.assert_allclose(float(mom[1]), float(my), rtol=1e-6)


def test_cv_terms_nd_3d_uniform_flow():
    """3D CV sanity: uniform flow through a body-free box exerts no net
    force; the carried momentum is the box volume times u."""
    import jax.numpy as jnp

    from navierstokessolver_tpu import GridSpec
    from navierstokessolver_tpu.grid import State
    from navierstokessolver_tpu.utils.forces import cv_terms_nd

    g = GridSpec(shape=(16, 12, 12), lengths=(1.6, 1.2, 1.2))
    st = State(
        u=(jnp.ones(g.face_shape(0)), jnp.zeros(g.face_shape(1)),
           jnp.zeros(g.face_shape(2))),
        p=jnp.full(g.shape, 0.7),
    )
    sf, mom = cv_terms_nd(g, st, 0.01, (4, 12, 3, 9, 3, 9))
    for c in sf:
        assert abs(float(c)) < 1e-5
    assert abs(float(mom[0]) - 0.8 * 0.6 * 0.6) < 1e-5
    assert abs(float(mom[1])) < 1e-6 and abs(float(mom[2])) < 1e-6



def test_run_scan_forces_matches_post_hoc():
    """The in-scan per-step force series equals computing cv_terms_nd on
    each post-step state (1-step scans), and the final states agree."""
    import numpy as np

    from navierstokessolver_tpu.cases import make_case
    from navierstokessolver_tpu.cases.cylinder import impulsive_start_state
    from navierstokessolver_tpu.utils.forces import cv_terms_nd

    case = make_case("cylinder", shape=(64, 32), lengths=(8.0, 4.0),
                     center=(2.0, 2.01))
    sim = case.sim
    box = (8, 24, 6, 26)
    n = 6

    st = impulsive_start_state(sim)
    st_scan, _d, sf, mom = sim.run_scan_forces(st, n, box)
    assert sf.shape == (n, 2) and mom.shape == (n, 2)

    st2 = impulsive_start_state(sim)
    for k in range(n):
        st2, _ = sim.run_scan(st2, 1)
        sfk, momk = cv_terms_nd(sim.grid, st2, sim.params.nu, box)
        np.testing.assert_allclose(
            np.asarray(sf[k]), np.asarray(np.stack(sfk)), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(mom[k]), np.asarray(np.stack(momk)), atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(st_scan.p), np.asarray(st2.p), atol=1e-5
    )


def test_dominant_frequency_synthetic():
    """Peak-picking with sub-bin interpolation recovers a known frequency
    to ~0.5% from a short noisy series."""
    import numpy as np

    from navierstokessolver_tpu.utils.forces import dominant_frequency

    rng = np.random.default_rng(7)
    dt = 0.05
    t = np.arange(400) * dt
    f0 = 0.73
    x = 1.5 + 0.8 * np.sin(2 * np.pi * f0 * t + 0.3) \
        + 0.05 * rng.normal(size=t.shape)
    f = dominant_frequency(x, dt)
    assert abs(f - f0) / f0 < 0.005, f
    assert dominant_frequency(np.ones(100), dt) == 0.0
