"""Live viewer: HTTP surface + event plumbing (no browser needed).

C12 completion (VERDICT r1 item 7): the reference's interactive window
(``main.cpp:48,87-98``) becomes an HTTP frame/event server; these tests
drive it with urllib exactly as the in-page JS would.
"""

import dataclasses
import json
import threading
import urllib.request

import numpy as np

import sdf3d_tpu as s
from sdf3d_tpu.interact.app import InteractiveSession
from sdf3d_tpu.interact.viewer import LiveViewer


def _make_viewer():
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=32, height=24)
    calls = []

    def render_fn(cam):
        calls.append(np.asarray(cam.position))
        # cheap deterministic "render": gradient keyed on camera x
        base = float(np.asarray(cam.position)[0])
        img = np.zeros((24, 32, 3), np.float32)
        img[..., 0] = np.linspace(0, 1, 32)[None, :] + base
        return img

    session = InteractiveSession(render_fn, cfg)
    viewer = LiveViewer(session, host="127.0.0.1", port=0)  # ephemeral port
    viewer.start()
    host, port = viewer.address
    return viewer, f"http://{host}:{port}", calls


def _get(url, binary=False):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read() if binary else r.read().decode()


def test_viewer_serves_page_frames_and_stats():
    viewer, base, calls = _make_viewer()
    try:
        page = _get(base + "/")
        assert "/stream" in page and "mousedown" in page

        viewer.step()
        png = _get(base + "/frame.png", binary=True)
        assert png.startswith(b"\x89PNG\r\n\x1a\n")

        stats = json.loads(_get(base + "/stats"))
        assert stats["frame"] == 0 and stats["rays_per_second"] > 0
    finally:
        viewer.stop()


def test_viewer_events_drive_navigation():
    viewer, base, calls = _make_viewer()
    try:
        viewer.step()
        p0 = calls[-1].copy()

        for ev in ({"type": "drag", "dx": 0.4, "dy": 0.0}, {"type": "scroll", "amount": 1.0}):
            req = urllib.request.Request(base + "/event", data=json.dumps(ev).encode(), method="POST")
            urllib.request.urlopen(req, timeout=10).read()

        # a few frames so the low-pass-decayed navigation integrates the input
        for _ in range(8):
            viewer.step(dt=1 / 30)
        p1 = calls[-1]
        assert not np.allclose(p0, p1), "navigation events did not move the camera"
    finally:
        viewer.stop()


def test_viewer_key_and_gamepad_events_drive_navigation():
    viewer, base, calls = _make_viewer()
    try:
        viewer.step()
        p0 = calls[-1].copy()
        for ev in (
            {"type": "key", "key": "d"},
            {"type": "gamepad", "lx": 0.9, "ly": 0.0, "rx": 0.0, "ry": 0.0, "zoom": 0.0},
        ):
            req = urllib.request.Request(base + "/event", data=json.dumps(ev).encode(), method="POST")
            urllib.request.urlopen(req, timeout=10).read()
        for _ in range(8):
            viewer.step(dt=1 / 30)
        assert not np.allclose(p0, calls[-1]), "key/gamepad events did not move the camera"
    finally:
        viewer.stop()


def test_viewer_stats_history_and_metrics():
    viewer, base, calls = _make_viewer()
    try:
        for _ in range(5):
            viewer.step()
        viewer.push_metric("loss", 3.0)
        viewer.push_metric("loss", 1.5)
        stats = json.loads(_get(base + "/stats"))
        assert len(stats["history"]["rays_per_second"]) == 5
        assert stats["metrics"]["loss"] == [3.0, 1.5]
        page = _get(base + "/")
        assert "canvas" in page and "getGamepads" in page and "keydown" in page
    finally:
        viewer.stop()


def test_viewer_local_device_reader_polled_per_frame():
    import io as _io
    import struct as _struct

    from sdf3d_tpu.interact.devices import _JS_EVENT_AXIS, JoystickReader

    viewer, base, calls = _make_viewer()
    try:
        viewer.step()
        p0 = calls[-1].copy()
        data = _struct.pack("<IhBB", 0, 32767, _JS_EVENT_AXIS, 0)
        viewer.device_readers.append(JoystickReader(fileobj=_io.BytesIO(data)))
        for _ in range(8):
            viewer.step(dt=1 / 30)
        assert not np.allclose(p0, calls[-1]), "local joystick did not move the camera"
    finally:
        viewer.stop()


def test_viewer_stream_yields_multipart_frames():
    viewer, base, calls = _make_viewer()
    try:
        viewer.step()
        got = {}

        def reader():
            req = urllib.request.urlopen(base + "/stream", timeout=10)
            got["head"] = req.headers.get("Content-Type", "")
            got["chunk"] = req.read(64)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        for _ in range(20):
            viewer.step()
            t.join(timeout=0.05)
            if not t.is_alive():
                break
        assert "multipart/x-mixed-replace" in got.get("head", "")
        assert b"--frame" in got.get("chunk", b"")
    finally:
        viewer.stop()
