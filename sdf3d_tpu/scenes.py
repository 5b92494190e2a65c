"""Canonical scenes: the reference scene and the flagship CSG scene.

The reference scene is fixed in GLSL
(``/root/reference/Code/shader/voxel_fragment.frag:54-81``); here it is a
parameter pytree, so the same scene that reproduces the reference pixel-for-
pixel is also the thing inverse rendering optimizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdf3d_tpu.sdf import (
    SDFNode,
    box,
    capsule,
    cylinder,
    ground_plane,
    onion,
    repeat_infinite,
    round_box,
    smooth_subtraction,
    smooth_union,
    sphere,
    subtraction,
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


def csg_showcase() -> SDFNode:
    """Hard + smooth CSG sampler: carved box, shelled sphere, blended pillar."""
    carved = subtraction(
        box(half_extents=(0.25, 0.25, 0.25), center=(-0.6, 0.3, 0.0)),
        sphere(center=(-0.6, 0.45, 0.2), radius=0.22),
    )
    shell = onion(sphere(center=(0.0, 0.35, 0.0), radius=0.25), 0.02) & box(
        half_extents=(0.3, 0.18, 0.3), center=(0.0, 0.22, 0.0)
    )
    pillar = smooth_union(
        cylinder(radius=0.1, half_height=0.3, center=(0.6, 0.3, 0.0)),
        sphere(center=(0.6, 0.65, 0.0), radius=0.15),
        k=0.1,
    )
    return union(ground_plane(), carved, shell, pillar)


def materials_scene() -> SDFNode:
    """The flagship geometry with per-object materials (sdf/materials.py):
    a gold-ish blob, a red rounded box, a teal torus, and a warm gray floor —
    the gallery scene where the per-leaf material channel is visible, and
    the target for inverse-material fits."""
    from sdf3d_tpu.lighting import material
    from sdf3d_tpu.sdf.materials import shaded

    floor = shaded(
        ground_plane(),
        material(ambient=(0.12, 0.11, 0.10), diffuse=(0.45, 0.42, 0.38), specular=(0.1, 0.1, 0.1)),
    )
    blob = shaded(
        sphere(center=(-0.25, 0.4, 0.0), radius=0.22),
        material(ambient=(0.2, 0.15, 0.02), diffuse=(0.85, 0.65, 0.13), specular=(0.9, 0.8, 0.4), shininess=48.0),
    )
    cube = shaded(
        round_box(half_extents=(0.2, 0.2, 0.2), corner_radius=0.03, center=(0.25, 0.3, 0.0)),
        material(ambient=(0.2, 0.02, 0.02), diffuse=(0.8, 0.1, 0.1)),
    )
    ring = shaded(
        torus(major=0.45, minor=0.06, center=(0.0, 0.12, 0.35)),
        material(ambient=(0.02, 0.15, 0.15), diffuse=(0.1, 0.7, 0.7), specular=(0.6, 0.6, 0.6), shininess=24.0),
    )
    return union(floor, smooth_union(blob, cube, k=0.15), ring)


def lattice_scene(period: float = 1.2, radius: float = 0.18) -> SDFNode:
    """Infinite xz lattice of spheres over the ground plane — the march-depth
    stress scene (many occluders, long shadow rays)."""
    field = repeat_infinite(
        sphere(center=(0.0, 0.35, 0.0), radius=radius), (period, 0.0, period)
    )
    return union(ground_plane(), field)


def fractal_scene(iterations: int = 6) -> SDFNode:
    """Power-8 Mandelbulb over the ground plane — the **eval-dominated**
    stress scene (~300 VPU ops per scene eval vs ~10 for the reference
    scene): the regime where per-step cost dwarfs march bookkeeping, so
    over-relaxed stepping and step-count levers actually pay
    (docs/performance.md, lever 8)."""
    from sdf3d_tpu.sdf import mandelbulb

    return union(
        ground_plane(), mandelbulb(center=(0.0, 0.55, 0.0), scale=0.45, iterations=iterations)
    )


def capsule_chain(n: int = 5) -> SDFNode:
    """Smooth-blended chain of capsules — a deep CSG tree (2n+1 nodes) for
    scene-compiler and march scaling tests."""
    out = None
    for i in range(n):
        a = (-0.6 + 1.2 * i / max(n - 1, 1), 0.25 + 0.12 * (i % 2), 0.0)
        b = (-0.6 + 1.2 * (i + 0.7) / max(n - 1, 1), 0.3, 0.1)
        link = capsule(a, b, 0.08)
        out = link if out is None else smooth_union(out, link, k=0.08)
    return union(ground_plane(), out)


def random_blobs(key=None, n: int = 8, seed: int = 0) -> SDFNode:
    """n randomly placed smooth-blended spheres: the parameterizable workload
    for throughput scaling (SDF cost grows linearly with n)."""
    key = jax.random.PRNGKey(seed) if key is None else key
    kc, kr = jax.random.split(key)
    centers = jax.random.uniform(kc, (n, 3), minval=-0.6, maxval=0.6) * jnp.array([1.0, 0.4, 1.0]) + jnp.array([0.0, 0.45, 0.0])
    radii = jax.random.uniform(kr, (n,), minval=0.08, maxval=0.2)
    out = None
    for i in range(n):
        s_i = sphere(center=tuple(centers[i].tolist()), radius=float(radii[i]))
        out = s_i if out is None else smooth_union(out, s_i, k=0.12)
    return union(ground_plane(), out)
