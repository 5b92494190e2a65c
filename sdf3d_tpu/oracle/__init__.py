"""Parity oracles: independent slow-but-obviously-correct renderers.

Two implementations of exactly the reference fragment program
(``/root/reference/Code/shader/voxel_fragment.frag:54-211``), used by the test
suite to validate the JAX/Pallas fast paths pixel-for-pixel (SURVEY.md §4):

- :mod:`sdf3d_tpu.oracle.numpy_oracle` — vectorized float32 NumPy.
- :mod:`sdf3d_tpu.oracle.native` — scalar C++ (per-pixel loops with real
  ``break``s, float32 throughout), compiled on demand with ``g++`` and loaded
  via ``ctypes``; also provides finite-difference parameter gradients.
"""

from sdf3d_tpu.oracle.numpy_oracle import render_reference_numpy
from sdf3d_tpu.oracle.native import (
    native_available,
    render_reference_native,
    native_fd_gradient,
)

__all__ = [
    "render_reference_numpy",
    "native_available",
    "render_reference_native",
    "native_fd_gradient",
]
