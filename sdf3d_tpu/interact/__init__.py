"""Interactive runtime: native navigation controller + frame-loop driver.

The reference's interactivity lives in the external Neutrino C++ runtime
(window, arcball, gamepad — ``/root/reference/Code/src/main.cpp:87-98``).
Here the same capability is a headless session: a native C++ navigation
controller (event filtering + view-matrix synthesis) driving the jitted
renderer, frames going to PNG/PPM sinks instead of a swapchain.
"""

from sdf3d_tpu.interact.controller import NavigationController, navigation_available
from sdf3d_tpu.interact.app import InteractiveSession, render_turntable
from sdf3d_tpu.interact.devices import JoystickReader, KeyboardReader, apply_key

__all__ = [
    "NavigationController",
    "navigation_available",
    "InteractiveSession",
    "render_turntable",
    "JoystickReader",
    "KeyboardReader",
    "apply_key",
]
