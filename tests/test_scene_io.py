"""Scene/setup serialization (sdf/io.py): exact JSON round-trips for every
node family, setup files, hand-editability, and the CLI --scene-file path.

The reference bakes its scene into shader source (voxel_fragment.frag:54-81);
here scenes are data — these tests pin the format's exactness guarantees.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.sdf import (
    load_scene,
    load_setup,
    save_scene,
    save_setup,
    scene_from_json,
    scene_to_json,
)

CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=32, height=24)
CAM, LIGHT, MAT = s.Camera.reference(), s.reference_light(), s.reference_material()


def _assert_tree_equal(a, b):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


SCENES = {
    "reference": lambda: s.reference_scene(),
    "flagship": lambda: s.flagship_scene(),
    "transforms": lambda: s.sdf.rotate(
        s.sdf.elongate(s.sdf.torus(), (0.1, 0.0, 0.0)), (0.0, 0.5, 0.0)
    ),
    "materials": lambda: s.sdf.union(
        s.sdf.shaded(s.sdf.sphere(radius=0.2), diffuse=(1.0, 0.0, 0.0)),
        s.sdf.ground_plane(),
    ),
    "grid": lambda: s.sdf.voxelize(s.sdf.sphere(radius=0.3), resolution=12),
    "neural": lambda: s.sdf.neural_sdf(key=3, hidden=16, depth=2),
    "smooth_csg": lambda: s.sdf.smooth_subtraction(
        s.sdf.box(half_extents=(0.3, 0.2, 0.2)), s.sdf.sphere(radius=0.25), k=0.1
    ),
}


class TestRoundtrip:
    @pytest.mark.parametrize("name", sorted(SCENES))
    def test_exact_roundtrip(self, name):
        scene = SCENES[name]()
        restored = scene_from_json(scene_to_json(scene))
        _assert_tree_equal(scene, restored)

    def test_static_fields_roundtrip(self):
        n = s.sdf.neural_sdf(key=0, hidden=16, depth=2)
        n = dataclasses.replace(n, precision="highest")
        assert scene_from_json(scene_to_json(n)).precision == "highest"

    def test_loaded_scene_renders_identically(self, tmp_path):
        scene = SCENES["materials"]()
        path = tmp_path / "scene.json"
        save_scene(path, scene)
        img_a = s.render(scene, CAM, LIGHT, MAT, CFG)
        img_b = s.render(load_scene(path), CAM, LIGHT, MAT, CFG)
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))

    def test_save_load_is_fixed_point(self, tmp_path):
        p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
        save_scene(p1, SCENES["flagship"]())
        save_scene(p2, load_scene(p1))
        assert p1.read_text() == p2.read_text()


class TestSetupFiles:
    def test_full_setup_roundtrip(self, tmp_path):
        path = tmp_path / "setup.json"
        cam = s.Camera.orbit(azimuth_deg=30.0, elevation_deg=15.0)
        save_setup(path, SCENES["reference"](), camera=cam, light=LIGHT,
                   material=MAT, config=CFG)
        setup = load_setup(path)
        _assert_tree_equal(setup["camera"], cam)
        _assert_tree_equal(setup["light"], LIGHT)
        _assert_tree_equal(setup["material"], MAT)
        assert setup["config"] == CFG

    def test_defaults_fill_omitted_entries(self, tmp_path):
        path = tmp_path / "scene_only.json"
        save_setup(path, SCENES["reference"]())
        setup = load_setup(path)
        _assert_tree_equal(setup["camera"], s.Camera.reference())
        assert setup["config"] == s.REFERENCE_CONFIG

    def test_plain_scene_file_loads_as_setup(self, tmp_path):
        path = tmp_path / "scene.json"
        save_scene(path, SCENES["reference"]())
        setup = load_setup(path)
        _assert_tree_equal(setup["scene"], SCENES["reference"]())


class TestEditabilityAndErrors:
    def test_small_arrays_are_editable_json(self, tmp_path):
        """A hand edit of a sphere radius in the JSON changes the scene."""
        path = tmp_path / "scene.json"
        save_scene(path, s.sdf.sphere(center=(0.0, 0.4, 0.0), radius=0.2))
        doc = json.loads(path.read_text())
        radius = doc["root"]["fields"]["radius"]
        assert radius["data"] == 0.20000000298023224 or radius["data"] == pytest.approx(0.2)
        radius["data"] = 0.5
        path.write_text(json.dumps(doc))
        assert float(load_scene(path).radius) == pytest.approx(0.5)

    def test_large_arrays_are_packed(self):
        g = s.sdf.voxelize(s.sdf.sphere(radius=0.3), resolution=12)
        doc = json.loads(scene_to_json(g))
        assert "b64" in doc["root"]["fields"]["values"]

    def test_unknown_type_rejected(self):
        bad = json.dumps({"format": "sdf3d-tpu/1",
                          "root": {"__type__": "Exploit", "fields": {}}})
        with pytest.raises(ValueError, match="unknown node"):
            scene_from_json(bad)

    def test_wrong_format_rejected(self):
        with pytest.raises(ValueError, match="not an"):
            scene_from_json(json.dumps({"root": {}}))

    def test_disallowed_dtype_rejected(self):
        """A hand-edited dtype outside the allowlist fails at load, not trace."""
        doc = json.loads(scene_to_json(s.sdf.voxelize(s.sdf.sphere(radius=0.3), resolution=12)))
        doc["root"]["fields"]["values"]["dtype"] = "float64"
        with pytest.raises(ValueError, match="dtype.*not allowed"):
            scene_from_json(json.dumps(doc))

    def test_truncated_b64_payload_rejected(self):
        """A b64 payload shorter than shape×itemsize gets a clear error."""
        doc = json.loads(scene_to_json(s.sdf.voxelize(s.sdf.sphere(radius=0.3), resolution=12)))
        values = doc["root"]["fields"]["values"]
        import base64

        raw = base64.b64decode(values["b64"])
        values["b64"] = base64.b64encode(raw[: len(raw) // 2]).decode("ascii")
        with pytest.raises(ValueError, match="bytes but"):
            scene_from_json(json.dumps(doc))


class TestCLISceneFile:
    def test_render_from_scene_file(self, tmp_path, capsys):
        from sdf3d_tpu.cli import main as cli_main

        path = tmp_path / "setup.json"
        save_setup(path, SCENES["reference"](), config=CFG)
        out = tmp_path / "out.png"
        rc = cli_main(["render", "--scene-file", str(path), "--out", str(out)])
        assert rc == 0
        assert out.exists()

    def test_flags_apply_on_top_of_scene_file(self, tmp_path):
        """--normals/--ao/--azimuth compose with a scene file instead of being
        silently dropped (and the orbit override keeps the file's fov)."""
        from sdf3d_tpu.cli import main as cli_main

        path = tmp_path / "setup.json"
        cam = s.Camera.orbit(azimuth_deg=10.0, fov_deg=42.0)
        save_setup(path, SCENES["reference"](), config=CFG, camera=cam)
        out = tmp_path / "out.png"
        rc = cli_main([
            "render", "--scene-file", str(path), "--out", str(out),
            "--normals", "tetrahedron", "--ao", "--azimuth", "33.0",
        ])
        assert rc == 0
        assert out.exists()

    def test_orbit_override_preserves_radius_and_zero_triggers(self, tmp_path, monkeypatch):
        """--azimuth alone keeps the file camera's distance (no teleport to
        the default orbit radius), and an explicit --azimuth 0 *does*
        trigger the override (None-sentinel flags, not falsy-zero)."""
        import numpy as np

        import sdf3d_tpu.cli as cli

        path = tmp_path / "setup.json"
        cam = s.Camera.orbit(azimuth_deg=10.0, radius=3.5, fov_deg=42.0)
        small = dataclasses.replace(CFG, width=16, height=12)
        save_setup(path, SCENES["reference"](), config=small, camera=cam)

        seen = {}
        import sdf3d_tpu as sdf3d

        orig_render = sdf3d.render

        def spy(scene, camera, light, mat, cfg):
            seen["cam"] = camera
            return orig_render(scene, camera, light, mat, cfg)

        monkeypatch.setattr(sdf3d, "render", spy)
        out = tmp_path / "o.png"
        rc = cli.main(["render", "--scene-file", str(path), "--out", str(out),
                       "--azimuth", "0.0"])
        assert rc == 0
        got = seen["cam"]
        # Distance about the orbit target preserved; azimuth-0 orbit applied.
        r = float(np.linalg.norm(np.asarray(got.position) - np.array([0.0, 0.2, 0.0])))
        assert r == pytest.approx(3.5, rel=1e-5)
        assert float(got.fov_deg) == pytest.approx(42.0)
        # azimuth 0, elevation 0 orbit at r=3.5 looks down -z from +z.
        assert np.asarray(got.position)[2] == pytest.approx(3.5, rel=1e-4)
