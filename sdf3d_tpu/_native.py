"""Shared loader for the native C-ABI components.

Resolution order:
1. a prebuilt library in ``$SDF3D_NATIVE_DIR`` (the CMake build tree —
   ``cmake -B build && cmake --build build``),
2. a content-addressed cached build under the system temp dir,
3. build on demand with ``g++`` into that cache.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import shutil
import subprocess
import tempfile


def load_native(src: pathlib.Path, prebuilt_name: str) -> ctypes.CDLL:
    """Load (building if needed) the shared library for ``src``.

    ``prebuilt_name``: the CMake output name, e.g. ``libsdf3d_oracle.so``.
    Raises on failure; callers wrap with availability checks.
    """
    prebuilt_dir = os.environ.get("SDF3D_NATIVE_DIR")
    if prebuilt_dir:
        candidate = pathlib.Path(prebuilt_dir) / prebuilt_name
        if candidate.exists():
            return ctypes.CDLL(str(candidate))

    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    cache = pathlib.Path(tempfile.gettempdir()) / "sdf3d_tpu_native"
    cache.mkdir(parents=True, exist_ok=True)
    lib_path = cache / f"{src.stem}_{tag}.so"
    if not lib_path.exists():
        gxx = shutil.which("g++")
        if gxx is None:
            raise RuntimeError("g++ not found and no prebuilt library available")
        subprocess.run(
            [gxx, "-O2", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(lib_path)],
            check=True,
            capture_output=True,
        )
    return ctypes.CDLL(str(lib_path))
