"""ctypes loader/builder for the native C++ parity oracle.

Compiles ``native_src/oracle.cpp`` on first use with ``g++`` into a cached
shared library (no pybind11 in this image — plain C ABI + ctypes per the
environment constraints) and exposes:

- :func:`render_reference_native` — scalar float32 render of the reference
  fragment program (``voxel_fragment.frag:54-211``);
- :func:`native_fd_gradient` — central-difference gradients of the rendered
  image w.r.t. any entry of the 23-float parameter block, the ground truth
  for gradient-parity tests (SURVEY.md §4, BASELINE config 3).
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

from sdf3d_tpu.oracle.numpy_oracle import OracleParams

_SRC = pathlib.Path(__file__).parent / "native_src" / "oracle.cpp"
_LIB = None
_BUILD_ERROR = None

#: Order of the 23-float parameter block — must match ``struct Params``.
PARAM_FIELDS = (
    ("sphere_center", 3),
    ("sphere_radius", 1),
    ("camera_pos", 3),
    ("fov_deg", 1),
    ("light_pos", 3),
    ("light_amb", 1),
    ("mat_amb", 3),
    ("mat_dif", 3),
    ("mat_ref", 3),
    ("mat_shn", 1),
    ("shadow_k", 1),
)
N_PARAMS = sum(n for _, n in PARAM_FIELDS)


def pack_params(prm: OracleParams) -> np.ndarray:
    """Flatten an :class:`OracleParams` into the 23-float native block."""
    out = []
    for name, n in PARAM_FIELDS:
        v = getattr(prm, name)
        out.extend(np.atleast_1d(np.asarray(v, np.float32)).tolist())
    arr = np.asarray(out, np.float32)
    assert arr.shape == (N_PARAMS,)
    return arr


def unpack_params(vec: np.ndarray) -> OracleParams:
    """Inverse of :func:`pack_params`."""
    vec = np.asarray(vec, np.float32)
    kwargs, i = {}, 0
    for name, n in PARAM_FIELDS:
        kwargs[name] = tuple(vec[i : i + n].tolist()) if n > 1 else float(vec[i])
        i += n
    return OracleParams(**kwargs)


def _load():
    global _LIB, _BUILD_ERROR
    if _LIB is not None or _BUILD_ERROR is not None:
        return _LIB
    try:
        from sdf3d_tpu._native import load_native

        lib = load_native(_SRC, "libsdf3d_oracle.so")
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.sdf3d_render_reference.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, f32p]
        lib.sdf3d_render_reference.restype = None
        _LIB = lib
    except Exception as e:  # pragma: no cover - environment-dependent
        _BUILD_ERROR = e
    return _LIB


def native_available() -> bool:
    """True if the C++ oracle compiled and loaded in this environment."""
    return _load() is not None


def render_reference_native(
    width: int = 800,
    height: int = 600,
    view_matrix: np.ndarray | None = None,
    params: OracleParams | None = None,
) -> np.ndarray:
    """Scalar C++ render of the reference scene; returns (H, W, 3) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native oracle unavailable: {_BUILD_ERROR}")
    V = np.eye(4, dtype=np.float32) if view_matrix is None else np.asarray(view_matrix, np.float32)
    vinv = np.ascontiguousarray(np.linalg.inv(V).astype(np.float32))
    pvec = np.ascontiguousarray(pack_params(params or OracleParams()))
    out = np.empty((height, width, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sdf3d_render_reference(
        vinv.ctypes.data_as(f32p),
        pvec.ctypes.data_as(f32p),
        ctypes.c_int(width),
        ctypes.c_int(height),
        out.ctypes.data_as(f32p),
    )
    return out


def native_fd_gradient(
    param_index: int,
    width: int = 64,
    height: int = 48,
    eps: float = 1e-3,
    view_matrix: np.ndarray | None = None,
    params: OracleParams | None = None,
) -> np.ndarray:
    """Central-difference image gradient w.r.t. parameter ``param_index``.

    Runs the scalar oracle at ``θᵢ ± eps`` (in float64 accumulation of the
    float32 renders) and returns ``(img₊ − img₋) / (2·eps)`` of shape
    (H, W, 3) — the ground truth that custom-VJP gradients are tested
    against.
    """
    base = pack_params(params or OracleParams()).astype(np.float64)
    hi, lo = base.copy(), base.copy()
    hi[param_index] += eps
    lo[param_index] -= eps
    img_hi = render_reference_native(width, height, view_matrix, unpack_params(hi)).astype(np.float64)
    img_lo = render_reference_native(width, height, view_matrix, unpack_params(lo)).astype(np.float64)
    return ((img_hi - img_lo) / (2.0 * eps)).astype(np.float32)
