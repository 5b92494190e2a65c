"""Per-object materials: selection/blend semantics, engine parity, gradients.

The reference shades everything with one global material
(``voxel_fragment.frag:186-189``); Shaded tags are a framework capability,
so these tests pin the semantics (hard CSG selects, smooth CSG blends,
subtraction keeps the base material), parity between the XLA path and the
fused Pallas kernel, gradient flow on both backward engines, and an
inverse-rendering fit that recovers per-object diffuse colors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.ops import PallasRenderConfig, render_pallas
from sdf3d_tpu.sdf.materials import material_at, scene_has_materials, shaded

PC = PallasRenderConfig(tile_h=8, tile_w=128, interpret=True)
CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=128, height=96)
CAM, LIGHT, MAT = s.Camera.reference(), s.reference_light(), s.reference_material()

RED = s.material(ambient=(0.3, 0.0, 0.0), diffuse=(0.9, 0.1, 0.1))
BLUE = s.material(ambient=(0.0, 0.0, 0.3), diffuse=(0.1, 0.1, 0.9))


def _two_sphere_scene(mat_a=RED, mat_b=BLUE):
    return s.sdf.union(
        s.sdf.ground_plane(),
        shaded(s.sdf.sphere(center=(-0.4, 0.3, 0.0), radius=0.25), mat_a),
        shaded(s.sdf.sphere(center=(0.4, 0.3, 0.0), radius=0.25), mat_b),
    )


class TestMaterialAt:
    def test_hard_union_selects_nearest(self):
        scene = _two_sphere_scene()
        p = jnp.array([[-0.4, 0.3, 0.3], [0.4, 0.3, 0.3]])  # near each sphere
        m = material_at(scene, p, MAT)
        np.testing.assert_allclose(np.asarray(m.diffuse[0]), [0.9, 0.1, 0.1])
        np.testing.assert_allclose(np.asarray(m.diffuse[1]), [0.1, 0.1, 0.9])

    def test_untagged_region_uses_default(self):
        scene = _two_sphere_scene()
        p = jnp.array([[3.0, 0.0, 3.0]])  # on the (untagged) ground plane
        m = material_at(scene, p, MAT)
        np.testing.assert_allclose(np.asarray(m.diffuse[0]), np.asarray(MAT.diffuse))

    def test_smooth_union_blends(self):
        a = shaded(s.sdf.sphere(center=(-0.2, 0.0, 0.0), radius=0.2), RED)
        b = shaded(s.sdf.sphere(center=(0.2, 0.0, 0.0), radius=0.2), BLUE)
        scene = s.sdf.smooth_union(a, b, k=0.2)
        mid = material_at(scene, jnp.array([[0.0, 0.0, 0.0]]), MAT).diffuse[0]
        # Equidistant point: exactly halfway.
        np.testing.assert_allclose(np.asarray(mid), [0.5, 0.1, 0.5], atol=1e-6)
        # Far on a's side: |db − da| = 0.4 ≥ k, so h clips to 1 → pure red.
        edge = material_at(scene, jnp.array([[-0.8, 0.0, 0.0]]), MAT).diffuse[0]
        np.testing.assert_allclose(np.asarray(edge), [0.9, 0.1, 0.1], atol=1e-6)

    def test_subtraction_keeps_base_material(self):
        base = shaded(s.sdf.sphere(radius=0.4), RED)
        cutter = shaded(s.sdf.sphere(center=(0.3, 0.0, 0.0), radius=0.3), BLUE)
        scene = s.sdf.subtraction(base, cutter)
        # A point inside the carved cavity region surfaces with a's material.
        m = material_at(scene, jnp.array([[0.15, 0.0, 0.0]]), MAT)
        np.testing.assert_allclose(np.asarray(m.diffuse[0]), [0.9, 0.1, 0.1])

    def test_transforms_pass_through(self):
        scene = shaded(s.sdf.sphere(radius=0.2), RED).translate((1.0, 0.0, 0.0)).rotate((0.0, 0.3, 0.0))
        assert scene_has_materials(scene)
        # Any point: the only tag is RED, so the resolved material is RED.
        m = material_at(scene, jnp.array([[0.9, 0.0, -0.2]]), MAT)
        np.testing.assert_allclose(np.asarray(m.diffuse[0]), [0.9, 0.1, 0.1])


class TestRenderParity:
    def test_tags_equal_to_default_change_nothing(self):
        plain = s.sdf.union(
            s.sdf.ground_plane(), s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2)
        )
        tagged = s.sdf.union(
            s.sdf.ground_plane(),
            shaded(s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2), MAT),
        )
        a = np.asarray(s.render(plain, CAM, LIGHT, MAT, CFG))
        b = np.asarray(s.render(tagged, CAM, LIGHT, MAT, CFG))
        # Identical math; XLA re-association of the broadcast material planes
        # costs ~1 ulp.
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_pallas_kernel_matches_xla(self):
        scene = _two_sphere_scene()
        a = np.asarray(s.render(scene, CAM, LIGHT, MAT, CFG))
        b = np.asarray(render_pallas(CFG, PC, scene, CAM, LIGHT, MAT))
        diff = np.abs(a - b).max(-1)
        assert (diff > 1e-4).mean() < 5e-4
        assert diff.max() < 0.05

    def test_colors_actually_differ_per_object(self):
        img = np.asarray(render_pallas(CFG, PC, _two_sphere_scene(), CAM, LIGHT, MAT))
        H, W = CFG.height, CFG.width
        left = img[: H // 2, : W // 2].reshape(-1, 3)
        right = img[: H // 2, W // 2 :].reshape(-1, 3)
        # The left half sees the red sphere, the right the blue one.
        assert left[:, 0].max() > 0.5 and right[:, 2].max() > 0.5


class TestMaterialGradients:
    def _loss(self, render_fn, scene, target):
        img = render_fn(scene)
        return jnp.mean((img - target) ** 2)

    def test_fused_backward_matches_xla_backward(self):
        scene = _two_sphere_scene()
        target = s.render(_two_sphere_scene(BLUE, RED), CAM, LIGHT, MAT, CFG)

        def loss_pallas(sc):
            return jnp.mean((render_pallas(CFG, PC, sc, CAM, LIGHT, MAT) - target) ** 2)

        from sdf3d_tpu.diff import render_diff

        def loss_xla(sc):
            return jnp.mean((render_diff(sc, CAM, LIGHT, MAT, CFG) - target) ** 2)

        g_p = jax.grad(loss_pallas)(scene)
        g_x = jax.grad(loss_xla)(scene)
        # Material-leaf gradients agree between engines (the geometry-leaf
        # comparison is covered by test_pallas.py's VJP suite).
        for attr in ("diffuse", "ambient", "specular"):
            gp = np.asarray(getattr(g_p.b.material, attr))
            gx = np.asarray(getattr(g_x.b.material, attr))
            np.testing.assert_allclose(gp, gx, rtol=2e-2, atol=2e-5)
            assert np.abs(gp).max() > 0.0  # gradients actually flow

    def test_fit_recovers_per_object_diffuse(self):
        cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=64, height=48)
        target_scene = _two_sphere_scene()
        target = s.render(target_scene, CAM, LIGHT, MAT, cfg)

        gray = s.material(ambient=(0.1, 0.1, 0.1), diffuse=(0.5, 0.5, 0.5))
        scene = _two_sphere_scene(gray, gray)

        from sdf3d_tpu.diff import render_diff

        def loss_fn(sc):
            return jnp.mean((render_diff(sc, CAM, LIGHT, MAT, cfg) - target) ** 2)

        # Optimize ONLY the material leaves (shape is already correct).
        # union(plane, A, B) folds to Union(Union(plane, A), B):
        # A = scene.a.b, B = scene.b.
        opt = optax.adam(0.05)

        def mat_leaves(sc):
            return (sc.a.b.material, sc.b.material)

        state = opt.init(mat_leaves(scene))

        @jax.jit
        def step(sc, st):
            l, g = jax.value_and_grad(loss_fn)(sc)
            updates, st = opt.update(mat_leaves(g), st)
            ua, ub = updates
            sc = sc.replace(
                a=sc.a.replace(b=sc.a.b.replace(material=optax.apply_updates(sc.a.b.material, ua))),
                b=sc.b.replace(material=optax.apply_updates(sc.b.material, ub)),
            )
            return sc, st, l

        losses = []
        for _ in range(60):
            scene, state, l = step(scene, state)
            losses.append(float(l))
        assert losses[-1] < 0.05 * losses[0], f"fit did not converge: {losses[::10]}"
        got_a = np.asarray(scene.a.b.material.diffuse)
        got_b = np.asarray(scene.b.material.diffuse)
        np.testing.assert_allclose(got_a, [0.9, 0.1, 0.1], atol=0.15)
        np.testing.assert_allclose(got_b, [0.1, 0.1, 0.9], atol=0.15)
