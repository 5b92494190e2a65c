"""Golden-image parity: JAX renderer == NumPy oracle == native C++ oracle.

The oracles independently implement the exact reference fragment program
(``/root/reference/Code/shader/voxel_fragment.frag:54-211``), quirks included
(SURVEY.md §4): these tests pin the fast paths to the reference's math
pixel-for-pixel.
"""

import dataclasses

import numpy as np
import pytest

import sdf3d_tpu as s
from sdf3d_tpu.oracle import (
    native_available,
    native_fd_gradient,
    render_reference_native,
    render_reference_numpy,
)
from sdf3d_tpu.oracle.native import N_PARAMS, pack_params, unpack_params
from sdf3d_tpu.oracle.numpy_oracle import OracleParams

W, H = 96, 72

needs_native = pytest.mark.skipif(not native_available(), reason="g++ oracle unavailable")


def _rot_y(deg):
    """A 4×4 arcball-style view matrix rotating about y."""
    t = np.radians(deg)
    c, sn = np.cos(t), np.sin(t)
    V = np.eye(4, dtype=np.float32)
    V[0, 0], V[0, 2], V[2, 0], V[2, 2] = c, sn, -sn, c
    return V


def _render_jax(view=None, width=W, height=H):
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=width, height=height)
    cam = s.Camera.reference(view_matrix=view)
    return np.asarray(
        s.render(s.reference_scene(), cam, s.reference_light(), s.reference_material(), cfg)
    )


@needs_native
@pytest.mark.smoke
def test_numpy_oracle_matches_native_bitlevel():
    """The two oracles are independent implementations of the same float32
    program — they must agree to last-bit rounding."""
    a = render_reference_numpy(W, H)
    b = render_reference_native(W, H)
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_jax_matches_numpy_oracle_identity_view():
    a = _render_jax()
    b = render_reference_numpy(W, H)
    d = np.abs(a - b)
    assert d.max() < 1e-3, f"max pixel err {d.max()}"
    assert d.mean() < 1e-5


@needs_native
@pytest.mark.smoke
def test_jax_matches_native_oracle_identity_view():
    a = _render_jax()
    b = render_reference_native(W, H)
    d = np.abs(a - b)
    assert d.max() < 1e-3
    assert d.mean() < 1e-5


@needs_native
def test_jax_matches_native_oracle_rotated_view():
    """Non-identity arcball: exercises the inverse-view transform of both eye
    (point, frag:180) and rays (direction, frag:192)."""
    V = _rot_y(30.0)
    a = _render_jax(view=V)
    b = render_reference_native(W, H, view_matrix=V)
    d = np.abs(a - b)
    assert d.max() < 1e-3
    assert d.mean() < 1e-5


def test_numpy_oracle_miss_pixels_are_ambient_plus_far_shading():
    """Reference quirk: no miss branch — top rows shade the far point, which
    degenerates to the ambient term (diffuse/spec → 0 at distance ~100)."""
    img = render_reference_numpy(64, 48)
    ambient = 0.1 * np.array([0.0, 0.2, 0.8], np.float32)
    np.testing.assert_allclose(img[0, 32], ambient, atol=1e-2)


def test_param_pack_roundtrip():
    prm = OracleParams(sphere_radius=0.3, light_amb=0.2)
    vec = pack_params(prm)
    assert vec.shape == (N_PARAMS,)
    back = unpack_params(vec)
    assert back.sphere_radius == pytest.approx(0.3)
    assert back.light_amb == pytest.approx(0.2)
    assert back.sphere_center == pytest.approx(prm.sphere_center)


@needs_native
def test_native_oracle_parameterized_scene():
    """Oracle params are runtime — moving the sphere changes the image."""
    base = render_reference_native(W, H)
    moved = render_reference_native(W, H, params=OracleParams(sphere_center=(0.3, 0.4, 0.0)))
    assert np.abs(base - moved).max() > 0.1


@needs_native
def test_native_fd_gradient_radius_nonzero_on_sphere():
    """Central-difference image gradient w.r.t. sphere radius (param 3) is
    concentrated around the sphere, zero in the far field."""
    g = native_fd_gradient(param_index=3, width=64, height=48, eps=1e-3)
    assert np.abs(g).max() > 0.1  # silhouette pixels respond strongly
    # Far-field rows (top of image) see no sphere: gradient ~0.
    assert np.abs(g[:4]).max() < 1e-3
