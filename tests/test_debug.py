"""Debug/validation subsystem and the scene-preset library."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.debug import (
    check_lipschitz,
    checked_render,
    finite_params,
    validate_scene,
)

CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=32, height=24)
CAM, LIGHT, MAT = s.Camera.reference(), s.reference_light(), s.reference_material()


class TestValidation:
    def test_good_scenes_pass_lipschitz(self):
        for scene in [s.reference_scene(), s.flagship_scene(), s.csg_showcase()]:
            ok, worst = check_lipschitz(scene)
            assert ok, f"worst ratio {worst}"

    def test_unnormalized_plane_fails_lipschitz(self):
        """The failure mode behind unstable fits: a scaled plane normal makes
        the field over-steep, breaking the sphere-trace bound."""
        bad = s.sdf.plane(normal=(0.0, 3.0, 0.0), offset=0.0)
        ok, worst = check_lipschitz(bad)
        assert not ok and worst > 2.0

    def test_finite_params(self):
        assert finite_params(s.flagship_scene())
        bad = s.sdf.sphere(radius=float("nan"))
        assert not finite_params(bad)

    def test_validate_scene_collects_and_strict_raises(self):
        bad = s.sdf.plane(normal=(0.0, 3.0, 0.0), offset=0.0)
        problems = validate_scene(bad)
        assert any("Lipschitz" in p for p in problems)
        with pytest.raises(ValueError, match="Lipschitz"):
            validate_scene(bad, strict=True)

    def test_checked_render_clean_scene_no_error(self):
        err, img = checked_render(s.reference_scene(), CAM, LIGHT, MAT, CFG)
        err.throw()  # no error expected
        assert img.shape == (24, 32, 3)


class TestScenePresets:
    @pytest.mark.parametrize(
        "scene_fn",
        [s.csg_showcase, s.lattice_scene, lambda: s.capsule_chain(4), lambda: s.random_blobs(n=4)],
    )
    def test_presets_render_and_are_valid_sdfs(self, scene_fn):
        scene = scene_fn()
        ok, worst = check_lipschitz(scene)
        assert ok, f"worst {worst}"
        img = np.asarray(s.render(scene, CAM, LIGHT, MAT, CFG))
        assert np.isfinite(img).all()
        # something visible beyond pure background ambient
        assert img.std() > 0.01

    def test_presets_compile_in_scene_program(self):
        from sdf3d_tpu.ops.scene_program import compile_scene, scene_param_vector

        for scene in [s.csg_showcase(), s.lattice_scene(), s.capsule_chain(3), s.random_blobs(n=3)]:
            vec = scene_param_vector(scene)
            soa = compile_scene(scene)
            pts = jnp.zeros((8, 128)), jnp.full((8, 128), 0.5), jnp.zeros((8, 128))
            d = soa(*pts, lambda i: vec[i])
            ref = scene.distance(jnp.stack([pts[0], pts[1], pts[2]], axis=-1))
            np.testing.assert_allclose(np.asarray(d), np.asarray(ref), atol=1e-6)
