"""Stereo projection modes: geometry of the rig and the composite layouts.

The reference only exercises ``nu::MONOCULAR`` (``main.cpp:50,95``); the
stereo rig is a framework capability, so these tests pin the rig geometry
(baseline offset, toe-in convergence), disparity sign, and the sbs/cross/
anaglyph composites against the monocular render.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

import sdf3d_tpu as s
from sdf3d_tpu.stereo import render_stereo, stereo_cameras

CFG = dataclasses.replace(s.REFERENCE_CONFIG, width=128, height=96)
CAM, LIGHT, MAT = s.Camera.reference(), s.reference_light(), s.reference_material()


class TestStereoRig:
    def test_baseline_offset_along_right_axis(self):
        l, r = stereo_cameras(CAM, baseline=0.1)
        sep = np.asarray(r.position - l.position)
        np.testing.assert_allclose(sep, np.asarray(CAM.c2w[:, 0]) * 0.1, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(l.c2w), np.asarray(r.c2w))

    def test_convergence_center_rays_meet(self):
        """Each eye's central optical axis passes through the convergence
        point at distance D along the mono camera's forward axis."""
        D = 2.5
        l, r = stereo_cameras(CAM, baseline=0.2, convergence=D)
        fwd = -np.asarray(CAM.c2w[:, 2])  # reference rays look down −z
        target = np.asarray(CAM.position) + D * fwd
        for eye in (l, r):
            eye_fwd = -np.asarray(eye.c2w[:, 2])
            to_target = target - np.asarray(eye.position)
            to_target /= np.linalg.norm(to_target)
            np.testing.assert_allclose(eye_fwd, to_target, atol=1e-6)

    def test_zero_baseline_degenerates_to_mono(self):
        sbs = np.asarray(render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, baseline=0.0))
        mono = np.asarray(s.render(s.reference_scene(), CAM, LIGHT, MAT, CFG))
        # lax.map batching re-associates a few ops vs the single render —
        # a handful of pixels differ by ~2e-6.
        np.testing.assert_allclose(sbs[:, : CFG.width], mono, atol=1e-5)
        np.testing.assert_allclose(sbs[:, CFG.width :], mono, atol=1e-5)


class TestStereoComposites:
    def test_sbs_shape_and_disparity_sign(self):
        img = np.asarray(
            render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, baseline=0.3)
        )
        assert img.shape == (CFG.height, 2 * CFG.width, 3)
        left, right = img[:, : CFG.width], img[:, CFG.width :]
        # The sphere (bright pixels above the ground) sits at finite depth:
        # the left eye sees it farther right than the right eye does.
        lum_l = left[: CFG.height // 2].mean(-1)
        lum_r = right[: CFG.height // 2].mean(-1)
        cols = np.arange(CFG.width)
        cx_l = (lum_l.sum(0) * cols).sum() / lum_l.sum()
        cx_r = (lum_r.sum(0) * cols).sum() / lum_r.sum()
        assert cx_l > cx_r + 1.0, (cx_l, cx_r)

    def test_cross_swaps_eyes(self):
        kw = dict(baseline=0.3)
        sbs = np.asarray(render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, "sbs", **kw))
        cross = np.asarray(render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, "cross", **kw))
        W = CFG.width
        np.testing.assert_array_equal(sbs[:, :W], cross[:, W:])
        np.testing.assert_array_equal(sbs[:, W:], cross[:, :W])

    def test_anaglyph_channels(self):
        kw = dict(baseline=0.3)
        sbs = np.asarray(render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, "sbs", **kw))
        ana = np.asarray(render_stereo(s.reference_scene(), CAM, LIGHT, MAT, CFG, "anaglyph", **kw))
        W = CFG.width
        assert ana.shape == (CFG.height, W, 3)
        np.testing.assert_array_equal(ana[..., 0], sbs[:, :W, 0])
        np.testing.assert_array_equal(ana[..., 1:], sbs[:, W:, 1:])
