"""Gradient parity: implicit-function VJP vs finite differences vs unrolled AD.

BASELINE config 3: pixel gradients w.r.t. SDF params + camera pose with a
custom VJP through the march.  FD comparisons are made on silhouette-free
pixels — interior gradients are the differentiable quantity; FD across a
silhouette measures moving-boundary terms that no pointwise AD sees
(diff.py module docstring).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.config import MarchConfig, RenderConfig, ShadowConfig

CFG = dataclasses.replace(
    s.REFERENCE_CONFIG, width=48, height=36,
    march=MarchConfig(max_steps=100, early_exit=True),
)
CAM = s.Camera.reference()


def _scene(radius=0.2, cx=0.0):
    return s.sdf.union(
        s.sdf.ground_plane(), s.sdf.sphere(center=(cx, 0.4, 0.0), radius=radius)
    )


def _interior_patch(img_like):
    """Pixel window safely inside the sphere's projection at 48×36."""
    return img_like[14:18, 22:26]


class TestImplicitDepth:
    def test_primal_matches_plain_march(self):
        d_plain = np.asarray(s.render_depth(_scene(), CAM, CFG))
        d_impl = np.asarray(s.depth_implicit(_scene(), CAM, CFG))
        np.testing.assert_array_equal(d_plain, d_impl)

    @pytest.mark.smoke
    def test_head_on_radius_gradient_is_minus_one(self):
        """A ray aimed at the sphere center: t = |c−o| − r ⇒ dt/dr = −1."""
        o = jnp.array([0.0, 0.4, 2.0])
        d = jnp.array([0.0, 0.0, -1.0])

        def t_of_r(r):
            sc = s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=r)
            return s.sphere_trace_implicit(CFG.march, sc, o, d)

        g = jax.grad(t_of_r)(jnp.float32(0.2))
        assert g == pytest.approx(-1.0, abs=1e-3)

    def test_depth_gradient_matches_fd_interior(self):
        """dt/dradius on interior pixels: implicit VJP vs central differences.

        Uses a tight march epsilon: at the default 0.01 the marched t is
        staircase-quantized in r, which FD (e=1e-3) sees as noise."""
        cfg = dataclasses.replace(CFG, march=MarchConfig(max_steps=200, epsilon=1e-4))

        def patch_sum(r):
            return jnp.sum(_interior_patch(s.depth_implicit(_scene(radius=r), CAM, cfg)))

        g = jax.grad(patch_sum)(jnp.float32(0.2))
        e = 1e-3
        fd = (patch_sum(jnp.float32(0.2 + e)) - patch_sum(jnp.float32(0.2 - e))) / (2 * e)
        assert g == pytest.approx(float(fd), rel=5e-2)

    def test_center_gradient_matches_fd_interior(self):
        cfg = dataclasses.replace(CFG, march=MarchConfig(max_steps=200, epsilon=1e-4))

        def patch_sum(cx):
            return jnp.sum(_interior_patch(s.depth_implicit(_scene(cx=cx), CAM, cfg)))

        g = jax.grad(patch_sum)(jnp.float32(0.0))
        e = 1e-3
        fd = (patch_sum(jnp.float32(e)) - patch_sum(jnp.float32(-e))) / (2 * e)
        assert g == pytest.approx(float(fd), rel=5e-2, abs=1e-3)

    def test_camera_position_gradient_matches_fd(self):
        cfg = dataclasses.replace(CFG, march=MarchConfig(max_steps=200, epsilon=1e-4))

        def patch_sum(z):
            cam = s.Camera(
                position=jnp.array([0.0, 0.2, z]),
                c2w=jnp.eye(3), fov_deg=jnp.float32(60.0),
            )
            return jnp.sum(_interior_patch(s.depth_implicit(_scene(), cam, cfg)))

        g = jax.grad(patch_sum)(jnp.float32(2.0))
        e = 1e-3
        fd = (patch_sum(jnp.float32(2.0 + e)) - patch_sum(jnp.float32(2.0 - e))) / (2 * e)
        assert g == pytest.approx(float(fd), rel=5e-2)

    def test_miss_rays_zero_gradient(self):
        o = jnp.array([0.0, 5.0, 2.0])
        d = jnp.array([0.0, 1.0, 0.0])  # straight up: hits nothing

        def t_of_r(r):
            sc = s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=r)
            return s.sphere_trace_implicit(CFG.march, sc, o, d)

        assert jax.grad(t_of_r)(jnp.float32(0.2)) == 0.0


class TestRenderDiff:
    def test_primal_matches_render(self):
        a = np.asarray(s.render(_scene(), CAM, s.reference_light(), s.reference_material(), CFG))
        b = np.asarray(s.render_diff(_scene(), CAM, s.reference_light(), s.reference_material(), CFG))
        np.testing.assert_array_equal(a, b)

    def test_grad_works_with_early_exit(self):
        """The whole point: gradients through the while_loop march."""

        def loss(r):
            img = s.render_diff(_scene(radius=r), CAM, s.reference_light(), s.reference_material(), CFG)
            return jnp.mean(img)

        g = jax.grad(loss)(jnp.float32(0.2))
        assert np.isfinite(g) and g != 0.0

    def test_implicit_matches_unrolled_ad_interior(self):
        """Implicit VJP vs unrolled-march AD on interior pixels (both with
        detached shadows): the two gradient estimators agree away from
        silhouettes."""
        cfg_unroll = dataclasses.replace(
            CFG, march=MarchConfig(max_steps=100, early_exit=False)
        )
        lm = s.reference_light(), s.reference_material()

        def loss_impl(r):
            img = s.render_diff(_scene(radius=r), CAM, *lm, CFG)
            return jnp.sum(_interior_patch(img))

        def loss_unroll(r):
            img = s.render(_scene(radius=r), CAM, *lm, cfg_unroll)
            return jnp.sum(_interior_patch(img))

        gi = jax.grad(loss_impl)(jnp.float32(0.2))
        gu = jax.grad(loss_unroll)(jnp.float32(0.2))
        assert gi == pytest.approx(float(gu), rel=5e-2)

    def test_light_position_gradient_flows(self):
        def loss(lx):
            light = s.point_light(position=(lx, 5.0, 0.0))
            img = s.render_diff(_scene(), CAM, light, s.reference_material(), CFG)
            return jnp.sum(_interior_patch(img))

        g = jax.grad(loss)(jnp.float32(5.0))
        assert np.isfinite(g) and g != 0.0

    def test_material_gradient_flows(self):
        def loss(shn):
            mat = s.material(shininess=shn)
            img = s.render_diff(_scene(), CAM, s.reference_light(), mat, CFG)
            return jnp.sum(img)

        g = jax.grad(loss)(jnp.float32(12.0))
        assert np.isfinite(g) and g != 0.0

    def test_shadow_ad_mode_matches_detach_primal(self):
        cfg_ad = dataclasses.replace(
            CFG,
            march=MarchConfig(max_steps=100, early_exit=False),
            shadow=ShadowConfig(grad="ad"),
        )
        lm = s.reference_light(), s.reference_material()
        a = np.asarray(s.render_diff(_scene(), CAM, *lm, CFG))
        b = np.asarray(s.render_diff(_scene(), CAM, *lm, cfg_ad))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestCoverage:
    """Soft-silhouette channel: ray_min_sdf_diff / coverage (diff.py)."""

    def test_coverage_near_one_on_hits_near_zero_on_misses(self):
        from sdf3d_tpu.camera import camera_rays
        from sdf3d_tpu.diff import coverage

        o, d = camera_rays(CAM, CFG.width, CFG.height)
        cov = np.asarray(coverage(CFG.march, _scene(), o, d))
        assert cov[16, 24] > 0.9   # sphere interior
        assert cov[30, 24] > 0.9   # ground plane
        assert cov[2, 24] < 0.1    # sky

    def test_min_sdf_gradient_sees_silhouettes(self):
        """The point of the channel: radius gradient is nonzero for rays that
        MISS the sphere but pass near it — where dt-gradients are zero."""
        from sdf3d_tpu.diff import ray_min_sdf_diff

        o = jnp.array([0.25, 0.4, 2.0])   # passes ~0.05 outside r=0.2 sphere
        d = jnp.array([0.0, 0.0, -1.0])

        def min_s(r):
            sc = s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=r)
            return ray_min_sdf_diff(CFG.march, sc, o, d)

        g = jax.grad(min_s)(jnp.float32(0.2))
        assert g == pytest.approx(-1.0, abs=0.05)  # d(closest approach)/dr = -1

    def test_coverage_loss_gradient_sign_matches_fd(self):
        """Oversized sphere: the coverage loss must push the radius DOWN
        (the force plain pixel losses are blind to)."""
        from sdf3d_tpu.camera import camera_rays
        from sdf3d_tpu.diff import coverage

        o, d = camera_rays(CAM, CFG.width, CFG.height)
        cov_t = coverage(CFG.march, _scene(radius=0.2), o, d)

        def loss(r):
            return jnp.sum((coverage(CFG.march, _scene(radius=r), o, d) - cov_t) ** 2)

        g = jax.grad(loss)(jnp.float32(0.27))
        e = 2e-3
        fd = (loss(jnp.float32(0.27 + e)) - loss(jnp.float32(0.27 - e))) / (2 * e)
        assert g > 0 and fd > 0  # same (correct) direction

    def test_silhouette_fit_recovers_from_bad_init(self):
        """The previously diverging case: image-only loss walks away; with
        the coverage term the radius comes back to truth."""
        import dataclasses as dc

        from sdf3d_tpu.fit import FitConfig, fit_scene

        cfg = dc.replace(CFG, width=64, height=48, background=(0.0, 0.0, 0.0))
        light, mat = s.reference_light(), s.reference_material()
        target = s.render(_scene(radius=0.2), CAM, light, mat, cfg)
        scene0 = s.sdf.union(
            s.sdf.ground_plane(), s.sdf.sphere(center=(0.08, 0.45, 0.0), radius=0.27)
        )
        trainable = jax.tree_util.tree_map(lambda _: True, scene0)
        trainable = trainable.replace(a=jax.tree_util.tree_map(lambda _: False, scene0.a))
        result = fit_scene(
            target, scene0, CAM, light, mat, cfg,
            FitConfig(steps=150, learning_rate=1e-2, loss="multiscale",
                      silhouette_weight=1.0),
            trainable=trainable,
        )
        assert float(result.scene.b.radius) == pytest.approx(0.2, abs=0.04)
