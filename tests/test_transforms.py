"""Transform nodes: translate/rotate/scale/round/onion/elongate/repeat."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf3d_tpu import sdf
from sdf3d_tpu.sdf.transforms import rotvec_to_matrix


def test_translate():
    s = sdf.sphere(radius=0.5)
    t = sdf.translate(s, (1.0, 2.0, 3.0))
    np.testing.assert_allclose(t(jnp.array([1.0, 2.0, 3.0])), -0.5, atol=1e-6)


def test_rotate_90deg_about_y():
    b = sdf.box(half_extents=(1.0, 0.1, 0.1))  # long along x
    r = sdf.rotate(b, (0.0, np.pi / 2, 0.0))  # now long along z
    assert float(r(jnp.array([0.0, 0.0, 0.9]))) < 0.0
    assert float(r(jnp.array([0.9, 0.0, 0.0]))) > 0.0


def test_rotvec_matrix_orthonormal():
    key = jax.random.PRNGKey(2)
    for k in jax.random.split(key, 4):
        v = jax.random.normal(k, (3,))
        R = rotvec_to_matrix(v)
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_rotvec_matrix_small_angle_stable():
    R = rotvec_to_matrix(jnp.zeros(3))
    np.testing.assert_allclose(R, jnp.eye(3), atol=1e-7)
    g = jax.jacobian(rotvec_to_matrix)(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(g))


def test_scale_keeps_metric():
    s = sdf.scale(sdf.sphere(radius=1.0), 2.0)
    # Scaled sphere has radius 2; true distance from (4,0,0) is 2.
    np.testing.assert_allclose(s(jnp.array([4.0, 0.0, 0.0])), 2.0, atol=1e-6)


def test_round_and_onion():
    s = sdf.sphere(radius=1.0)
    np.testing.assert_allclose(
        sdf.round_edges(s, 0.2)(jnp.array([2.0, 0.0, 0.0])), 0.8, atol=1e-6
    )
    shell = sdf.onion(s, 0.1)
    np.testing.assert_allclose(shell(jnp.array([1.0, 0.0, 0.0])), -0.1, atol=1e-6)
    np.testing.assert_allclose(shell(jnp.zeros(3)), 0.9, atol=1e-6)


def test_elongate():
    e = sdf.elongate(sdf.sphere(radius=0.5), (1.0, 0.0, 0.0))
    # Capsule-like along x: surface at |x| = 1.5 on axis.
    np.testing.assert_allclose(e(jnp.array([1.5, 0.0, 0.0])), 0.0, atol=1e-6)
    np.testing.assert_allclose(e(jnp.array([0.0, 0.5, 0.0])), 0.0, atol=1e-6)


def test_repeat_infinite():
    r = sdf.repeat_infinite(sdf.sphere(radius=0.2), (2.0, 0.0, 0.0))
    d0 = r(jnp.array([0.0, 0.0, 0.0]))
    d1 = r(jnp.array([4.0, 0.0, 0.0]))  # two periods over
    np.testing.assert_allclose(d0, d1, atol=1e-6)
    np.testing.assert_allclose(d0, -0.2, atol=1e-6)


def test_method_sugar_matches_factories():
    s = sdf.sphere(radius=0.5)
    p = jnp.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(
        s.translate((0.1, 0.0, 0.0))(p), sdf.translate(s, (0.1, 0.0, 0.0))(p)
    )
    np.testing.assert_allclose(s.scale(2.0)(p), sdf.scale(s, 2.0)(p))
    np.testing.assert_allclose(s.round(0.1)(p), sdf.round_edges(s, 0.1)(p))
