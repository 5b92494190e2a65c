"""March semantics: sphere trace, soft shadows, AO, normal estimation."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdf3d_tpu import (
    AOConfig,
    MarchConfig,
    ShadowConfig,
    ambient_occlusion,
    hit_mask,
    normal_autodiff,
    normal_central,
    normal_tetrahedron,
    soft_shadow,
    sphere_trace,
)
from sdf3d_tpu.scenes import reference_scene
from sdf3d_tpu import sdf

CFG = MarchConfig()


def test_sphere_trace_hits_sphere():
    s = sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2)
    o = jnp.array([0.0, 0.4, 2.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t = sphere_trace(s.distance, o, d, CFG)
    # Surface at t = 1.8; march terminates when sdf < ε so t ∈ [1.8 − ε, 1.8].
    assert 1.8 - CFG.epsilon <= float(t) <= 1.8 + 1e-5
    assert bool(hit_mask(t, CFG))


def test_sphere_trace_miss_exceeds_range():
    s = sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2)
    o = jnp.array([0.0, 0.4, 2.0])
    d = jnp.array([0.0, 0.0, 1.0])  # away from the sphere
    t = sphere_trace(s.distance, o, d, CFG)
    assert float(t) > CFG.max_distance
    assert not bool(hit_mask(t, CFG))


def test_sphere_trace_batched():
    scene = reference_scene()
    o = jnp.broadcast_to(jnp.array([0.0, 0.2, 2.0]), (4, 7, 3))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (4, 7, 3))
    t = sphere_trace(scene.distance, o, dirs, CFG)
    assert t.shape == (4, 7)
    assert jnp.all(jnp.isfinite(t))


def test_early_exit_matches_fixed_trip():
    scene = reference_scene()
    o = jnp.array([[0.0, 0.2, 2.0], [0.0, 1.0, 2.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.2, -1.0]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t_early = sphere_trace(scene.distance, o, dirs, MarchConfig(early_exit=True))
    t_fixed = sphere_trace(scene.distance, o, dirs, MarchConfig(early_exit=False))
    np.testing.assert_array_equal(np.asarray(t_early), np.asarray(t_fixed))


def test_soft_shadow_unoccluded_is_one():
    scene = reference_scene()
    # Point on the plane far from the sphere, light straight overhead at 45°
    # azimuth — nothing in between.
    o = jnp.array([3.0, 0.02, 3.0])
    d = jnp.array([0.0, 1.0, 0.0])
    sh = soft_shadow(scene.distance, o, d, ShadowConfig(), CFG)
    np.testing.assert_allclose(float(sh), 1.0, atol=1e-3)


def test_soft_shadow_occluded_is_dark():
    scene = reference_scene()
    # Point on the plane directly under the sphere, ray straight up through it.
    o = jnp.array([0.0, 0.02, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    sh = soft_shadow(scene.distance, o, d, ShadowConfig(), CFG)
    assert float(sh) < 0.05


def test_soft_shadow_penumbra_between():
    scene = reference_scene()
    # Grazing ray past the sphere edge → partial shadow.
    o = jnp.array([0.26, 0.02, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    sh = soft_shadow(scene.distance, o, d, ShadowConfig(k=2.0), CFG)
    assert 0.01 < float(sh) < 0.99


def test_soft_shadow_no_nans_on_reference_image_rays():
    scene = reference_scene()
    o = jnp.array([[0.0, 0.02, 0.0], [5.0, 0.02, 5.0], [0.0, 0.6, 0.0]])
    d = jnp.tile(jnp.array([[0.577, 0.577, 0.577]]), (3, 1))
    sh = soft_shadow(scene.distance, o, d, ShadowConfig(), CFG)
    assert jnp.all(jnp.isfinite(sh))
    assert jnp.all((sh >= 0.0) & (sh <= 1.0))


@pytest.mark.parametrize("fn", [normal_central, normal_tetrahedron], ids=["central", "tetra"])
def test_fd_normals_match_analytic_on_sphere(fn):
    s = sdf.sphere(center=(0.0, 0.0, 0.0), radius=1.0)
    p = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.577, 0.577, 0.577]])
    n = fn(s.distance, p, 0.01)
    expect = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(n, expect, atol=1e-2)


def test_autodiff_normals_exact_on_sphere():
    s = sdf.sphere(center=(0.0, 0.0, 0.0), radius=1.0)
    p = jnp.array([[1.0, 0.0, 0.0], [0.577, 0.577, 0.577]])
    n = normal_autodiff(s.distance, p)
    expect = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(n, expect, atol=1e-6)


def test_ao_open_vs_occluded():
    scene = reference_scene()
    cfg = AOConfig(enabled=True)
    # Open point on the plane, far from the sphere.
    p_open = jnp.array([5.0, 0.0, 5.0])
    n_up = jnp.array([0.0, 1.0, 0.0])
    ao_open = ambient_occlusion(scene.distance, p_open, n_up, cfg)
    # Point on the plane right at the sphere contact gap — occluded above.
    p_occ = jnp.array([0.0, 0.0, 0.0])
    ao_occ = ambient_occlusion(scene.distance, p_occ, n_up, cfg)
    assert float(ao_open) > 0.95
    assert float(ao_occ) < float(ao_open)


class TestRelaxedMarch:
    """Over-relaxed sphere tracing (MarchConfig.relaxation > 1)."""

    def _rays(self):
        from sdf3d_tpu.camera import Camera, camera_rays

        return camera_rays(Camera.reference(), 64, 48)

    @pytest.mark.parametrize("omega", [1.2, 1.6, 1.9])
    def test_relaxed_distances_close_to_exact(self, omega):
        scene = reference_scene()
        o, d = self._rays()
        exact = np.asarray(sphere_trace(scene.distance, o, d, CFG))
        relaxed = np.asarray(
            sphere_trace(scene.distance, o, d, MarchConfig(relaxation=omega))
        )
        # Rays that *converged* (landed with sdf < ε) must land within a few
        # epsilon of the exact march.  Rays that exhausted the step budget
        # without converging (slow horizon-ward escapes — a reference quirk:
        # they are shaded wherever the loop ran out) legitimately travel
        # farther under relaxation and are excluded.
        s_final = np.asarray(scene.distance(o + exact[..., None] * d))
        converged = (exact <= CFG.max_distance) & (s_final < CFG.epsilon)
        assert np.mean(converged) > 0.5  # the scene's ground plane dominates
        assert np.max(np.abs(relaxed[converged] - exact[converged])) < 5 * CFG.epsilon
        # True range-misses miss in both.
        miss = exact > CFG.max_distance
        assert np.all(relaxed[miss] > CFG.max_distance)

    def test_relaxed_uses_fewer_sdf_evals_on_grazing_rays(self):
        # A grazing ray along a ground plane converges geometrically; the
        # relaxed march must need meaningfully fewer steps. Count evals by
        # wrapping the SDF.
        scene = sdf.ground_plane()
        o = jnp.array([0.0, 1.0, 0.0])
        d = jnp.array([0.0, -0.05, 1.0]) / jnp.linalg.norm(jnp.array([0.0, -0.05, 1.0]))

        def count_steps(cfg):
            t = 0.0
            steps = 0
            import numpy as onp

            t = 0.0
            prev_r = 0.0
            step_len = 0.0
            om = cfg.relaxation
            for _ in range(cfg.max_steps):
                p = onp.asarray(o) + t * onp.asarray(d)
                s = float(p[1])
                steps += 1
                fail = om > 1.0 and (abs(s) + prev_r < step_len)
                hit = (not fail) and s < cfg.epsilon
                new_step = step_len * (1.0 - om) if fail else om * s
                if hit:
                    new_step = s
                if fail:
                    om = 1.0
                t += new_step
                prev_r = abs(s)
                step_len = new_step
                if hit or t > cfg.max_distance:
                    break
            return steps

        exact_steps = count_steps(MarchConfig())
        relaxed_steps = count_steps(MarchConfig(relaxation=1.6))
        assert relaxed_steps < exact_steps * 0.75
        # And the jnp implementation agrees with the exact march's landing.
        t_exact = float(sphere_trace(scene.distance, o, d, CFG))
        t_relax = float(sphere_trace(scene.distance, o, d, MarchConfig(relaxation=1.6)))
        assert abs(t_relax - t_exact) < 5 * CFG.epsilon
