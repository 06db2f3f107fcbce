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

