"""Canonical scenes: the reference scene and the flagship CSG scene.

The reference scene is fixed in GLSL
(``/root/reference/Code/shader/voxel_fragment.frag:54-81``); here it is a
parameter pytree, so the same scene that reproduces the reference pixel-for-
pixel is also the thing inverse rendering optimizes.
"""

from __future__ import annotations

from sdf3d_tpu.sdf import (
    SDFNode,
    ground_plane,
    round_box,
    smooth_union,
    sphere,
    torus,
    union,
)


def reference_scene() -> SDFNode:
    """``min(plane_y0, sphere((0, 0.4, 0), r=0.2))`` — exactly
    ``sceneSDF`` (``voxel_fragment.frag:73-81``; union order preserved)."""
    return union(ground_plane(), sphere(center=(0.0, 0.4, 0.0), radius=0.2))


def flagship_scene() -> SDFNode:
    """The framework's headline CSG scene (BASELINE config 2): sphere ⊔ₖ
    rounded box smooth-min blended, plus a torus, on the ground plane —
    exercises every primitive class the north star names (sphere, box, plane,
    min and smooth-min CSG)."""
    blob = smooth_union(
        sphere(center=(-0.25, 0.4, 0.0), radius=0.22),
        round_box(half_extents=(0.2, 0.2, 0.2), corner_radius=0.03, center=(0.25, 0.3, 0.0)),
        k=0.15,
    )
    ring = torus(major=0.45, minor=0.06, center=(0.0, 0.12, 0.35))
    return union(ground_plane(), blob, ring)


def sphere_scene() -> SDFNode:
    """Single sphere (BASELINE config 1: 256×256 Lambertian smoke scene)."""
    return sphere(center=(0.0, 0.4, 0.0), radius=0.2)
