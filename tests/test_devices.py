"""Input-device plumbing: Linux joystick parsing, keyboard mapping, and the
browser-event path into the navigation controller.

The reference reads live gamepads per frame via GLFW
(``/root/reference/Code/src/main.cpp:94``); here the kernel joystick API and
a cbreak tty are the device surfaces (interact/devices.py), feeding the same
native controller (deadzone filter in navigation.cpp).
"""

import io
import struct

import numpy as np

from sdf3d_tpu.interact import NavigationController
from sdf3d_tpu.interact.devices import (
    _JS_EVENT_AXIS,
    _JS_EVENT_BUTTON,
    _JS_EVENT_INIT,
    JoystickReader,
    KeyboardReader,
    apply_key,
)


def _js(value, etype, number, t=0):
    return struct.pack("<IhBB", t, value, etype, number)


def _nav():
    return NavigationController().configure()


class TestJoystickReader:
    def test_parses_axis_and_button_events(self):
        data = (
            _js(32767, _JS_EVENT_AXIS, 0)        # lx full right
            + _js(-16384, _JS_EVENT_AXIS, 1)     # ly half up
            + _js(1, _JS_EVENT_BUTTON, 3)
            + _js(8192, _JS_EVENT_AXIS | _JS_EVENT_INIT, 3)  # init event counts
        )
        js = JoystickReader(fileobj=io.BytesIO(data))
        assert js.poll() == 4
        assert js.axes[0] == 1.0
        assert js.axes[1] == float(np.float64(-16384) / 32767.0)
        assert js.buttons[3] is True
        lx, ly, rx, ry, zoom = js.state()
        assert lx == 1.0 and rx == js.axes[3] and zoom == 0.0  # triggers idle

    def test_trigger_zoom(self):
        data = _js(32767, _JS_EVENT_AXIS, 5) + _js(-32767, _JS_EVENT_AXIS, 2)
        js = JoystickReader(fileobj=io.BytesIO(data))
        js.poll()
        *_, zoom = js.state()
        assert zoom == 1.0  # right trigger pressed, left idle

    def test_apply_moves_camera_through_deadzone_filter(self):
        nav = _nav()
        p0 = nav.pose()
        js = JoystickReader(fileobj=io.BytesIO(_js(32767, _JS_EVENT_AXIS, 0)))
        js.apply(nav)
        for _ in range(8):
            nav.step(1 / 30)
        assert nav.pose()[0] != p0[0]  # azimuth moved

    def test_below_deadzone_is_filtered(self):
        nav = _nav()
        js = JoystickReader(fileobj=io.BytesIO(_js(int(0.2 * 32767), _JS_EVENT_AXIS, 0)))
        js.apply(nav)  # 0.2 < the reference's 0.30 deadzone
        for _ in range(8):
            nav.step(1 / 30)
        az, el, dist, _ = nav.pose()
        assert az == 0.0 and el == 0.0


class TestKeyboard:
    def test_apply_key_bindings(self):
        nav = _nav()
        assert apply_key(nav, "d")
        assert apply_key(nav, "ArrowUp".lower())
        assert apply_key(nav, "-")
        assert not apply_key(nav, "q")
        for _ in range(8):
            nav.step(1 / 30)
        az, el, dist, target = nav.pose()
        assert az != 0.0          # 'd' orbits
        assert dist > 2.0         # '-' zooms out
        assert tuple(target) != (0.0, 0.0, 0.0)  # arrow pans

    def test_reader_decodes_escape_sequences(self):
        kb = KeyboardReader(fileobj=io.StringIO("a\x1b[Cz+"))
        assert kb.keys() == ["a", "arrowright", "z", "+"]

    def test_reader_apply_counts_bound_keys(self):
        nav = _nav()
        kb = KeyboardReader(fileobj=io.StringIO("wq\x1b[D"))
        assert kb.apply(nav) == 2  # 'w' and arrowleft bound; 'q' not
