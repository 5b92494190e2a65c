"""Native navigation controller and the headless frame loop."""

import dataclasses

import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.interact import (
    InteractiveSession,
    NavigationController,
    navigation_available,
    render_turntable,
)

CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=48, height=32)

needs_native = pytest.mark.skipif(not navigation_available(), reason="g++ unavailable")


class TestController:
    def test_drag_decays(self):
        nav = NavigationController().configure()
        nav.set_pose(distance=2.0)
        nav.mouse_drag(0.1, 0.0)
        az = []
        for _ in range(40):
            nav.step(1 / 60)
            az.append(nav.pose()[0])
        assert az[-1] > 0
        # velocity decays: late increments much smaller than early ones
        assert abs(az[-1] - az[-2]) < 0.1 * abs(az[1] - az[0])

    @needs_native
    def test_python_fallback_matches_native(self):
        results = []
        for prefer in (True, False):
            nav = NavigationController(prefer_native=prefer).configure()
            nav.set_pose(azimuth=0.2, elevation=0.1, distance=2.0)
            nav.mouse_drag(0.05, 0.03)
            nav.scroll(0.5)
            nav.gamepad(lx=0.6, ry=0.5, zoom=0.0)
            for _ in range(20):
                nav.step(1 / 60)
            results.append(nav)
        p_nat, p_py = results[0].pose(), results[1].pose()
        assert results[0].is_native and not results[1].is_native
        np.testing.assert_allclose(p_nat[:3], p_py[:3], rtol=1e-4)
        np.testing.assert_allclose(
            results[0].view_matrix(), results[1].view_matrix(), atol=1e-5
        )

    def test_gamepad_deadzone(self):
        nav = NavigationController().configure(deadzone=0.3)
        nav.set_pose()
        nav.gamepad(lx=0.2)  # inside deadzone: no motion
        nav.step(1 / 60)
        assert nav.pose()[0] == 0.0
        nav.gamepad(lx=0.9)
        nav.step(1 / 60)
        assert nav.pose()[0] != 0.0

    def test_elevation_clamped(self):
        nav = NavigationController().configure()
        nav.set_pose()
        for _ in range(100):
            nav.mouse_drag(0.0, 0.5)
            nav.step(1 / 30)
        assert abs(nav.pose()[1]) <= 1.56

    def test_view_matrix_orthonormal(self):
        nav = NavigationController().configure()
        nav.set_pose(azimuth=0.7, elevation=0.4, distance=3.0, target=(0.1, 0.2, 0.3))
        V = nav.view_matrix()
        R = V[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestSession:
    def _render_fn(self):
        light, mat = s.reference_light(), s.reference_material()
        scene = s.reference_scene()
        return lambda cam: s.render(scene, cam, light, mat, CFG)

    def test_session_frames_move_with_input(self):
        sess = InteractiveSession(self._render_fn(), CFG)
        sess.nav.set_pose(azimuth=0.3, elevation=0.3, distance=2.0, target=(0, 0.2, 0))
        frames = sess.run([lambda n: n.mouse_drag(0.1, 0.0)] * 3 + [None] * 2)
        assert len(frames) == 5
        assert np.abs(frames[0] - frames[-1]).max() > 1e-3
        assert len(sess.stats) == 5 and sess.stats[0].rays_per_second > 0

    def test_session_writes_frames(self, tmp_path):
        sess = InteractiveSession(self._render_fn(), CFG)
        sess.nav.set_pose(distance=2.0, target=(0, 0.2, 0))
        sess.run([None, None], out_dir=str(tmp_path))
        assert (tmp_path / "frame_00000.png").exists()
        assert (tmp_path / "frame_00001.png").exists()

    def test_turntable(self, tmp_path):
        frames = render_turntable(self._render_fn(), CFG, n_frames=4, out_dir=str(tmp_path))
        assert len(frames) == 4
        # different azimuths -> different images
        assert np.abs(frames[0] - frames[2]).max() > 1e-3
