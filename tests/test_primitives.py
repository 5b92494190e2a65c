"""Primitive SDF correctness: known distances, eikonal property, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf3d_tpu import sdf


def test_sphere_known_distances():
    s = sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2)
    p = jnp.array([[0.0, 0.4, 1.0], [0.0, 0.4, 0.0], [0.0, 0.6, 0.0]])
    np.testing.assert_allclose(s(p), [0.8, -0.2, 0.0], atol=1e-6)


def test_sphere_batch_shapes():
    s = sdf.sphere(radius=1.0)
    p = jnp.zeros((4, 5, 3))
    assert s(p).shape == (4, 5)


def test_plane_is_reference_ground():
    g = sdf.ground_plane()
    p = jnp.array([[3.0, 0.7, -2.0], [0.0, -0.3, 5.0]])
    np.testing.assert_allclose(g(p), [0.7, -0.3], atol=1e-7)


def test_box_exact_distances():
    b = sdf.box(half_extents=(1.0, 2.0, 3.0))
    # Face distance.
    np.testing.assert_allclose(b(jnp.array([1.5, 0.0, 0.0])), 0.5, atol=1e-6)
    # Corner distance.
    np.testing.assert_allclose(
        b(jnp.array([2.0, 3.0, 4.0])), np.sqrt(3.0), atol=1e-6
    )
    # Inside: negative, distance to the nearest face.
    np.testing.assert_allclose(b(jnp.array([0.0, 0.0, 0.0])), -1.0, atol=1e-6)


def test_round_box_shrinks_distance():
    rb = sdf.round_box(half_extents=(1.0, 1.0, 1.0), corner_radius=0.1)
    np.testing.assert_allclose(rb(jnp.array([2.0, 0.0, 0.0])), 0.9, atol=1e-6)


def test_torus_known_distances():
    t = sdf.torus(major=1.0, minor=0.25)
    np.testing.assert_allclose(t(jnp.array([1.0, 0.0, 0.0])), -0.25, atol=1e-6)
    np.testing.assert_allclose(t(jnp.array([2.0, 0.0, 0.0])), 0.75, atol=1e-6)
    np.testing.assert_allclose(t(jnp.array([0.0, 1.0, 0.0])), np.sqrt(2.0) - 0.25, atol=1e-6)


def test_capsule_known_distances():
    c = sdf.capsule(a=(0.0, 0.0, 0.0), b=(0.0, 1.0, 0.0), radius=0.25)
    np.testing.assert_allclose(c(jnp.array([0.0, 0.5, 1.0])), 0.75, atol=1e-6)
    np.testing.assert_allclose(c(jnp.array([0.0, 2.0, 0.0])), 0.75, atol=1e-6)


def test_cylinder_known_distances():
    c = sdf.cylinder(radius=0.5, half_height=1.0)
    np.testing.assert_allclose(c(jnp.array([1.0, 0.0, 0.0])), 0.5, atol=1e-6)
    np.testing.assert_allclose(c(jnp.array([0.0, 2.0, 0.0])), 1.0, atol=1e-6)
    np.testing.assert_allclose(c(jnp.array([1.0, 2.0, 0.0])), np.sqrt(0.25 + 1.0), atol=1e-6)


@pytest.mark.parametrize(
    "node",
    [
        sdf.sphere(center=(0.1, -0.2, 0.3), radius=0.7),
        sdf.box(half_extents=(0.5, 0.8, 0.3)),
        sdf.torus(major=0.8, minor=0.2),
        sdf.capsule(a=(-0.3, 0.0, 0.0), b=(0.3, 0.4, 0.1), radius=0.2),
        sdf.cylinder(radius=0.4, half_height=0.6),
    ],
    ids=["sphere", "box", "torus", "capsule", "cylinder"],
)
def test_eikonal_property(node):
    """Exact SDFs satisfy |∇d| = 1 almost everywhere."""
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, (64, 3), minval=-2.0, maxval=2.0)
    g = jax.grad(lambda q: jnp.sum(node(q)))(p)
    norms = jnp.linalg.norm(g, axis=-1)
    np.testing.assert_allclose(norms, np.ones(64), atol=1e-3)


def test_sphere_gradient_direction():
    s = sdf.sphere(center=(0.0, 0.0, 0.0), radius=1.0)
    p = jnp.array([2.0, 0.0, 0.0])
    g = jax.grad(lambda q: s(q))(p)
    np.testing.assert_allclose(g, [1.0, 0.0, 0.0], atol=1e-6)


def test_scene_is_pytree_with_f32_leaves():
    s = sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2)
    leaves = jax.tree_util.tree_leaves(s)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(s)
    assert flat.shape == (4,)  # center (3,) + radius ()
    s2 = unravel(flat)
    np.testing.assert_allclose(s2.radius, 0.2)
