"""End-to-end forward rendering (pure-XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf3d_tpu import (
    Camera,
    MarchConfig,
    REFERENCE_CONFIG,
    RenderConfig,
    ShadowConfig,
    AOConfig,
    reference_light,
    reference_material,
    render,
    render_depth,
)
from sdf3d_tpu.scenes import flagship_scene, reference_scene, sphere_scene
from sdf3d_tpu.lighting import material

SMALL = RenderConfig(width=64, height=48)


def test_reference_render_shape_and_finiteness():
    img = render(reference_scene(), Camera.reference(), reference_light(), reference_material(), SMALL)
    assert img.shape == (48, 64, 3)
    assert img.dtype == jnp.float32
    assert jnp.all(jnp.isfinite(img))


def test_miss_rays_shaded_ambient_plus():
    """Reference quirk: no miss branch — far rays still get ambient+ shading
    (voxel_fragment.frag has no background path)."""
    img = render(reference_scene(), Camera.reference(), reference_light(), reference_material(), SMALL)
    # Top corner ray points into the sky: it must still carry at least the
    # ambient term 0.1 * (0, 0.2, 0.8).
    np.testing.assert_allclose(img[0, 0], [0.0, 0.02, 0.08], atol=5e-2)


def test_background_compositing():
    cfg = RenderConfig(width=64, height=48, background=(1.0, 0.0, 0.0))
    img = render(reference_scene(), Camera.reference(), reference_light(), reference_material(), cfg)
    np.testing.assert_allclose(img[0, 0], [1.0, 0.0, 0.0], atol=1e-6)
    # Lower-middle pixel hits the plane — not background.
    assert float(img[40, 32, 0]) != 1.0


def test_depth_sphere_vs_plane_vs_sky():
    d = render_depth(reference_scene(), Camera.reference(), SMALL)
    assert d.shape == (48, 64)
    # Sphere sits slightly above center → some pixel above center has depth < 2.2.
    assert float(jnp.min(d)) < 2.2
    # Sky pixels exceed max distance.
    assert float(jnp.max(d)) > 100.0


def test_config1_lambert_sphere():
    """BASELINE config 1: single sphere, Lambertian shade, CPU-runnable."""
    cfg = RenderConfig(
        width=64,
        height=64,
        shading="lambert",
        shadow=ShadowConfig(enabled=False),
        ray_mode="pinhole",
        background=(0.0, 0.0, 0.0),
    )
    cam = Camera.look_at((0.0, 0.4, 2.0), target=(0.0, 0.4, 0.0), fov_deg=40.0)
    img = render(sphere_scene(), cam, reference_light(), material(), cfg)
    assert jnp.all(jnp.isfinite(img))
    # Sphere is lit from up-right: its center pixel is brighter than background.
    assert float(img[32, 32].sum()) > 0.05
    np.testing.assert_allclose(img[0, 0], [0.0, 0.0, 0.0], atol=1e-6)


def test_config2_flagship_csg_scene():
    """BASELINE config 2 shape: CSG smooth-min scene with tetrahedron normals."""
    cfg = RenderConfig(
        width=80,
        height=60,
        normals="tetrahedron",
        ao=AOConfig(enabled=True),
    )
    cam = Camera.orbit(azimuth_deg=20.0, elevation_deg=15.0, radius=2.0, target=(0.0, 0.3, 0.0))
    img = render(flagship_scene(), cam, reference_light(), reference_material(), cfg)
    assert img.shape == (60, 80, 3)
    assert jnp.all(jnp.isfinite(img))
    assert float(img.std()) > 0.01  # non-degenerate image


def test_render_is_jit_cached():
    scene = reference_scene()
    args = (scene, Camera.reference(), reference_light(), reference_material(), SMALL)
    img1 = render(*args)
    img2 = render(*args)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_render_differentiable_everything():
    """Gradients flow to scene, camera, light, and material (plain AD through
    the masked march — needs the fixed-trip fori_loop variant, since
    lax.while_loop is not reverse-differentiable; the efficient implicit path
    is diff.py)."""
    cfg = RenderConfig(width=16, height=12, march=MarchConfig(max_steps=40, early_exit=False))
    scene = reference_scene()
    cam = Camera.reference()
    light = reference_light()
    mat = reference_material()

    def loss(scene, cam, light, mat):
        img = render(scene, cam, light, mat, cfg)
        return jnp.sum(img**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(scene, cam, light, mat)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in flat)
    # At least some gradient signal reaches the material.
    mat_leaves = jax.tree_util.tree_leaves(grads[3])
    assert any(float(jnp.abs(g).sum()) > 0 for g in mat_leaves)


class TestSupersampling:
    def test_aa_shape_and_smoothing(self):
        import dataclasses

        import jax.numpy as jnp

        import sdf3d_tpu as s

        cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=48, height=32)
        args = (s.reference_scene(), s.Camera.reference(), s.reference_light(), s.reference_material())
        plain = s.render(*args, cfg)
        aa = s.render_aa(*args, cfg, factor=2)
        assert aa.shape == plain.shape
        # Definition: box filter of the 2x render.
        big = s.render(*args, dataclasses.replace(cfg, width=96, height=64))
        pooled = big.reshape(32, 2, 48, 2, 3).mean(axis=(1, 3))
        assert float(jnp.abs(aa - pooled).max()) < 1e-6
        # And it actually differs from the 1-spp render at silhouettes.
        assert float(jnp.abs(aa - plain).max()) > 1e-3

    def test_aa_differentiable(self):
        import dataclasses

        import jax
        import jax.numpy as jnp

        import sdf3d_tpu as s

        cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=24, height=16)

        def loss(r):
            sc = s.sdf.union(s.sdf.ground_plane(), s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=r))
            img = s.render_aa(sc, s.Camera.reference(), s.reference_light(),
                              s.reference_material(), cfg, factor=2, engine="diff")
            return jnp.mean(img)

        g = jax.grad(loss)(jnp.float32(0.2))
        assert bool(jnp.isfinite(g)) and g != 0.0


def test_render_batch_matches_per_frame():
    import dataclasses
    import jax
    import sdf3d_tpu as s

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=64, height=48)
    light, mat = s.reference_light(), s.reference_material()
    scene = s.reference_scene()
    cams = [s.Camera.orbit(azimuth_deg=120.0 * k) for k in range(3)]
    cameras = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    out = s.render_batch(scene, cameras, light, mat, cfg, engine="xla")
    assert out.shape == (3, 48, 64, 3)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            np.asarray(s.render(scene, cams[k], light, mat, cfg)),
            atol=1e-5,
        )


def test_render_batch_pallas_interpret_matches_xla():
    """The default engine='pallas' branch, run in interpret mode on CPU via
    the pc override (ADVICE r1: the default path must be testable)."""
    import dataclasses
    import jax
    import sdf3d_tpu as s
    from sdf3d_tpu.ops import PallasRenderConfig

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=128, height=16)
    light, mat = s.reference_light(), s.reference_material()
    scene = s.reference_scene()
    cams = [s.Camera.orbit(azimuth_deg=180.0 * k) for k in range(2)]
    cameras = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    pc = PallasRenderConfig(tile_h=8, tile_w=128, interpret=True, ray_sdf=False)
    out = s.render_batch(scene, cameras, light, mat, cfg, engine="pallas", pc=pc)
    ref = s.render_batch(scene, cameras, light, mat, cfg, engine="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFastProfile:
    """config.fast_config: the declared non-parity fast profile
    (tetrahedron normals + 32-step shadows; relaxation measured-and-
    rejected — see config.fast_config)."""

    def test_image_close_to_parity(self):
        import dataclasses

        import sdf3d_tpu as s

        cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=128, height=96)
        fast = s.fast_config(cfg)
        assert fast.march.relaxation == 1.0  # ω>1 measured slower: see fast_config
        assert fast.normals == "tetrahedron"
        assert fast.shadow.max_steps == 32
        light, mat = s.reference_light(), s.reference_material()
        scene = s.flagship_scene()
        a = np.asarray(s.render(scene, s.Camera.reference(), light, mat, cfg))
        b = np.asarray(s.render(scene, s.Camera.reference(), light, mat, fast))
        mse = float(np.mean((a - b) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 30.0, f"fast profile too far from parity: {psnr:.1f} dB"

    def test_fused_fit_eligible(self):
        import sdf3d_tpu as s
        from sdf3d_tpu.ops.fit_kernel import fused_l2_eligible

        fast = s.fast_config()
        assert fused_l2_eligible(fast, s.reference_scene())
        # The fast profile marches unrelaxed, so the silhouette min-SDF
        # tracker composes with it too.
        assert fused_l2_eligible(fast, s.reference_scene(), sil_w=1.0)
        # A relaxed march, by contrast, is locked out of the tracker.
        import dataclasses as _dc

        relaxed = _dc.replace(
            fast, march=_dc.replace(fast.march, relaxation=1.6)
        )
        assert not fused_l2_eligible(relaxed, s.reference_scene(), sil_w=1.0)
