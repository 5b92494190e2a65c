"""CSG combinator semantics: hard min/max ops, smooth blends, operator sugar."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf3d_tpu import sdf
from sdf3d_tpu.sdf.csg import SmoothUnion


def _two():
    a = sdf.sphere(center=(-0.5, 0.0, 0.0), radius=0.4)
    b = sdf.sphere(center=(0.5, 0.0, 0.0), radius=0.4)
    return a, b


def _pts():
    key = jax.random.PRNGKey(1)
    return jax.random.uniform(key, (32, 3), minval=-1.5, maxval=1.5)


def test_union_is_min():
    a, b = _two()
    p = _pts()
    np.testing.assert_allclose(sdf.union(a, b)(p), jnp.minimum(a(p), b(p)), atol=1e-7)


def test_intersection_is_max():
    a, b = _two()
    p = _pts()
    np.testing.assert_allclose(
        sdf.intersection(a, b)(p), jnp.maximum(a(p), b(p)), atol=1e-7
    )


def test_subtraction():
    a, b = _two()
    p = _pts()
    np.testing.assert_allclose(
        sdf.subtraction(a, b)(p), jnp.maximum(a(p), -b(p)), atol=1e-7
    )


def test_operator_sugar():
    a, b = _two()
    p = _pts()
    np.testing.assert_allclose((a | b)(p), sdf.union(a, b)(p), atol=1e-7)
    np.testing.assert_allclose((a & b)(p), sdf.intersection(a, b)(p), atol=1e-7)
    np.testing.assert_allclose((a - b)(p), sdf.subtraction(a, b)(p), atol=1e-7)


def test_nary_union_folds():
    a, b = _two()
    c = sdf.sphere(center=(0.0, 1.0, 0.0), radius=0.3)
    p = _pts()
    expect = jnp.minimum(jnp.minimum(a(p), b(p)), c(p))
    np.testing.assert_allclose(sdf.union(a, b, c)(p), expect, atol=1e-7)


def test_smooth_union_bounds_and_blend():
    a, b = _two()
    p = _pts()
    k = 0.3
    su = sdf.smooth_union(a, b, k)(p)
    hard = jnp.minimum(a(p), b(p))
    # Smooth union is ≤ hard union, and within k/4 of it (polynomial smin bound).
    assert jnp.all(su <= hard + 1e-6)
    assert jnp.all(su >= hard - k / 4.0 - 1e-6)


def test_smooth_union_equals_min_far_from_blend():
    a, b = _two()
    p = jnp.array([[-0.5, 0.0, 0.0]])  # deep inside a, |da - db| >> k
    su = sdf.smooth_union(a, b, 0.05)(p)
    np.testing.assert_allclose(su, jnp.minimum(a(p), b(p)), atol=1e-6)


def test_smooth_union_symmetric():
    a, b = _two()
    p = _pts()
    np.testing.assert_allclose(
        sdf.smooth_union(a, b, 0.3)(p), sdf.smooth_union(b, a, 0.3)(p), atol=1e-6
    )


def test_smooth_union_differentiable_at_blend():
    a, b = _two()
    # Equidistant point — the hard min has a kink here; smooth union must not.
    p = jnp.array([0.0, 0.0, 0.0])
    g = jax.grad(lambda q: sdf.smooth_union(a, b, 0.3)(q))(p)
    assert jnp.all(jnp.isfinite(g))


def test_smooth_intersection_and_subtraction_bounds():
    a, b = _two()
    p = _pts()
    si = sdf.smooth_intersection(a, b, 0.3)(p)
    assert jnp.all(si >= jnp.maximum(a(p), b(p)) - 1e-6)
    ss = sdf.smooth_subtraction(a, b, 0.3)(p)
    assert jnp.all(ss >= jnp.maximum(a(p), -b(p)) - 1e-6)


def test_smooth_union_k_gradient_flows():
    a, b = _two()
    p = jnp.array([0.0, 0.1, 0.0])

    def f(k):
        return SmoothUnion(a=a, b=b, k=k)(p)

    g = jax.grad(f)(jnp.float32(0.3))
    assert jnp.isfinite(g)
    assert g != 0.0
