"""Camera and ray generation, including reference-parity conventions."""

import jax.numpy as jnp
import numpy as np

from sdf3d_tpu import Camera, camera_rays, generate_rays, pixel_grid
from sdf3d_tpu.camera import focal_z


def test_pixel_grid_ranges_and_orientation():
    qx, qy = pixel_grid(8, 4)
    assert qx.shape == (4, 8) and qy.shape == (4, 8)
    # x increases left→right, y decreases top→bottom (row 0 is top).
    np.testing.assert_allclose(qx[0, 0], -1.0 + 1.0 / 8.0, atol=1e-6)
    np.testing.assert_allclose(qx[0, -1], 1.0 - 1.0 / 8.0, atol=1e-6)
    np.testing.assert_allclose(qy[0, 0], 1.0 - 1.0 / 4.0, atol=1e-6)
    np.testing.assert_allclose(qy[-1, 0], -1.0 + 1.0 / 4.0, atol=1e-6)


def test_reference_camera_defaults():
    cam = Camera.reference()
    np.testing.assert_allclose(cam.position, [0.0, 0.2, 2.0], atol=1e-7)
    np.testing.assert_allclose(cam.c2w, jnp.eye(3), atol=1e-7)
    np.testing.assert_allclose(cam.fov_deg, 60.0)


def test_reference_focal_z_quirk():
    """The shader uses −2/tan(fov·π/360) (voxel_fragment.frag:191)."""
    z = focal_z(jnp.float32(60.0), "reference")
    np.testing.assert_allclose(z, -2.0 / np.tan(np.radians(30.0)), rtol=1e-6)
    z_pinhole = focal_z(jnp.float32(60.0), "pinhole")
    np.testing.assert_allclose(z_pinhole, -1.0 / np.tan(np.radians(30.0)), rtol=1e-6)


def test_center_ray_points_forward():
    cam = Camera.reference()
    d = generate_rays(cam, jnp.zeros(()), jnp.zeros(()), 1.0, "reference")
    np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=1e-6)


def test_rays_are_normalized():
    cam = Camera.reference()
    _, dirs = camera_rays(cam, 16, 12)
    np.testing.assert_allclose(jnp.linalg.norm(dirs, axis=-1), np.ones((12, 16)), atol=1e-6)


def test_from_view_matrix_translation():
    # View matrix that translates the world by (0,0,-1): the camera moves +z.
    V = jnp.eye(4).at[2, 3].set(-1.0)
    cam = Camera.from_view_matrix(V)
    np.testing.assert_allclose(cam.position, [0.0, 0.2, 3.0], atol=1e-5)
    np.testing.assert_allclose(cam.c2w, jnp.eye(3), atol=1e-6)


def test_from_view_matrix_rotation_applies_to_rays():
    # 90° rotation about y as a view matrix.
    c, s = 0.0, 1.0
    V = jnp.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )
    cam = Camera.from_view_matrix(V)
    d = generate_rays(cam, jnp.zeros(()), jnp.zeros(()), 1.0, "reference")
    # Center ray (0,0,-1) rotated by inverse(V) → (-1, 0, 0) for this V.
    np.testing.assert_allclose(jnp.abs(d), [1.0, 0.0, 0.0], atol=1e-5)


def test_look_at_points_at_target():
    cam = Camera.look_at((0.0, 1.0, 2.0), target=(0.0, 0.0, 0.0))
    d = generate_rays(cam, jnp.zeros(()), jnp.zeros(()), 1.0, "pinhole")
    expect = -jnp.array([0.0, 1.0, 2.0]) / jnp.sqrt(5.0)
    np.testing.assert_allclose(d, expect, atol=1e-6)


def test_orbit_camera_radius():
    cam = Camera.orbit(azimuth_deg=45.0, elevation_deg=30.0, radius=3.0, target=(0, 0, 0))
    np.testing.assert_allclose(jnp.linalg.norm(cam.position), 3.0, rtol=1e-6)


def test_from_pose_identity():
    cam = Camera.from_pose((1.0, 2.0, 3.0))
    np.testing.assert_allclose(cam.c2w, jnp.eye(3), atol=1e-7)
