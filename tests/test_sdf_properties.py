"""Property-based SDF correctness: metric bounds every primitive must obey.

For exact SDFs (all primitives here except Ellipsoid, documented as a bound):
1. |f(a) − f(b)| ≤ ‖a−b‖ (1-Lipschitz — sphere tracing's soundness bound);
2. f ≈ 0 on sampled surface points;
3. marching from any outside point by f(p) never crosses the surface
   (f(p + f(p)·u) ≥ 0 for any unit u — the defining property of a signed
   *distance* bound, exactly what the march relies on per step);
4. CSG identities: union ≤ each operand, intersection ≥ each operand,
   smooth ops within k of hard ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdf3d_tpu as s

KEY = jax.random.PRNGKey(42)

PRIMITIVES = {
    "sphere": s.sdf.sphere(center=(0.1, -0.2, 0.3), radius=0.4),
    "plane": s.sdf.plane(normal=(0.0, 1.0, 0.0), offset=-0.1),
    "box": s.sdf.box(half_extents=(0.3, 0.2, 0.5), center=(0.1, 0.0, -0.2)),
    "round_box": s.sdf.round_box(half_extents=(0.3, 0.2, 0.4), corner_radius=0.05),
    "torus": s.sdf.torus(major=0.5, minor=0.15, center=(0.0, 0.2, 0.0)),
    "capsule": s.sdf.capsule(a=(-0.2, 0.0, 0.0), b=(0.3, 0.4, 0.1), radius=0.15),
    "cylinder": s.sdf.cylinder(radius=0.25, half_height=0.3, center=(0.0, 0.1, 0.0)),
}


def _points(key, n=2048, box=2.0):
    return jax.random.uniform(key, (n, 3), minval=-box, maxval=box)


@pytest.mark.parametrize("name", list(PRIMITIVES))
class TestMetricProperties:
    def test_lipschitz(self, name):
        prim = PRIMITIVES[name]
        ka, kb = jax.random.split(jax.random.fold_in(KEY, hash(name) % 2**31))
        a = _points(ka)
        b = a + jax.random.normal(kb, a.shape) * 0.05
        fa, fb = prim.distance(a), prim.distance(b)
        ratio = jnp.abs(fa - fb) / jnp.maximum(jnp.linalg.norm(a - b, axis=-1), 1e-9)
        assert float(ratio.max()) <= 1.001

    def test_march_step_never_crosses(self, name):
        """f(p + f(p)·u) ≥ −tol for outside p and ANY direction u."""
        prim = PRIMITIVES[name]
        k1, k2 = jax.random.split(jax.random.fold_in(KEY, 7 + hash(name) % 2**31))
        p = _points(k1)
        f = prim.distance(p)
        outside = f > 0
        u = jax.random.normal(k2, p.shape)
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        stepped = prim.distance(p + f[..., None] * u)
        violations = outside & (stepped < -1e-4)
        assert not bool(violations.any()), f"{int(violations.sum())} crossings"

    def test_zero_on_surface(self, name):
        """Walk from random points along -∇f by f — lands on the level set."""
        prim = PRIMITIVES[name]
        p = _points(jax.random.fold_in(KEY, 13))
        g = jax.vmap(jax.grad(lambda q: prim.distance(q)))(p)
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
        # Only exact from outside; iterate a few times for curved fields.
        q = p
        for _ in range(8):
            q = q - prim.distance(q)[..., None] * jax.vmap(
                jax.grad(lambda r: prim.distance(r))
            )(q)
        f_surf = prim.distance(q)
        ok = jnp.abs(f_surf) < 1e-3
        assert float(ok.mean()) > 0.98


class TestCSGIdentities:
    A = s.sdf.sphere(center=(0.2, 0.0, 0.0), radius=0.5)
    B = s.sdf.box(half_extents=(0.4, 0.3, 0.3), center=(-0.1, 0.1, 0.0))

    def test_union_lower_bounds(self):
        p = _points(KEY)
        u = (self.A | self.B).distance(p)
        assert bool(jnp.all(u <= self.A.distance(p) + 1e-6))
        assert bool(jnp.all(u <= self.B.distance(p) + 1e-6))

    def test_intersection_upper_bounds(self):
        p = _points(KEY)
        i = (self.A & self.B).distance(p)
        assert bool(jnp.all(i >= self.A.distance(p) - 1e-6))
        assert bool(jnp.all(i >= self.B.distance(p) - 1e-6))

    def test_smooth_union_within_k_of_hard(self):
        p = _points(KEY)
        k = 0.1
        hard = (self.A | self.B).distance(p)
        smooth = s.sdf.smooth_union(self.A, self.B, k=k).distance(p)
        assert bool(jnp.all(smooth <= hard + 1e-6))  # smooth blends inward
        assert float(jnp.max(hard - smooth)) <= k / 2 + 1e-5  # quilez bound k/4·... ≤ k/2

    def test_subtraction_vs_intersection_complement(self):
        p = _points(KEY)
        sub = s.sdf.subtraction(self.A, self.B).distance(p)
        manual = jnp.maximum(self.A.distance(p), -self.B.distance(p))
        np.testing.assert_allclose(np.asarray(sub), np.asarray(manual), atol=0)


class TestTransformMetric:
    def test_rotation_preserves_distance(self):
        p = _points(KEY)
        base = PRIMITIVES["box"]
        rot = s.sdf.rotate(base, (0.4, -0.2, 0.7))
        ok, worst = __import__("sdf3d_tpu.debug", fromlist=["check_lipschitz"]).check_lipschitz(rot)
        assert ok, worst

    def test_scale_keeps_metric(self):
        scaled = s.sdf.scale(PRIMITIVES["sphere"], 2.5)
        from sdf3d_tpu.debug import check_lipschitz

        ok, worst = check_lipschitz(scaled)
        assert ok, worst

    def test_translate_is_exact_shift(self):
        p = _points(KEY)
        t = s.sdf.translate(PRIMITIVES["torus"], (0.3, -0.1, 0.2))
        direct = PRIMITIVES["torus"].distance(p - jnp.array([0.3, -0.1, 0.2]))
        np.testing.assert_allclose(np.asarray(t.distance(p)), np.asarray(direct), atol=0)
