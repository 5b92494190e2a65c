"""Analytic SDF primitives as differentiable pytree nodes.

The reference ships exactly two primitives — a hard-coded sphere and the
``y = 0`` ground plane (``/root/reference/Code/shader/voxel_fragment.frag:54-71``).
This module supplies those two with *runtime, differentiable* parameters plus
the standard analytic family (box, rounded box, torus, capsule, cylinder) the
north-star configs require.  All distance fields are exact (true Euclidean
distance) except where noted.
"""

from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from sdf3d_tpu.sdf.node import SDFNode, as_f32, vlength, vlength_safe


@struct.dataclass
class Sphere(SDFNode):
    """Sphere: ``length(p - center) - radius``.

    Reference: ``sphereSDF`` at ``voxel_fragment.frag:54-64`` (center
    (0, 0.4, 0), r = 0.2 hard-coded there; parameters here).
    """

    center: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        return vlength(p - self.center) - self.radius


@struct.dataclass
class Plane(SDFNode):
    """Half-space bounded by the plane ``dot(normal, p) - offset = 0``.

    ``normal`` must be unit length for a true distance.  The reference's
    ground plane (``planeSDF`` returning ``position.y``,
    ``voxel_fragment.frag:66-71``) is ``Plane(normal=(0,1,0), offset=0)``.
    """

    normal: jnp.ndarray  # (3,)
    offset: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(p * self.normal, axis=-1) - self.offset


@struct.dataclass
class Box(SDFNode):
    """Axis-aligned box, exact SDF (Quilez ``sdBox``).

    ``q = |p - center| - half_extents``;
    ``d = length(max(q, 0)) + min(max_component(q), 0)``.
    """

    center: jnp.ndarray  # (3,)
    half_extents: jnp.ndarray  # (3,)

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        q = jnp.abs(p - self.center) - self.half_extents
        outside = vlength_safe(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside


@struct.dataclass
class RoundBox(SDFNode):
    """Box with rounded edges: box SDF minus corner radius."""

    center: jnp.ndarray  # (3,)
    half_extents: jnp.ndarray  # (3,)
    corner_radius: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        q = jnp.abs(p - self.center) - self.half_extents
        outside = vlength_safe(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside - self.corner_radius


@struct.dataclass
class Torus(SDFNode):
    """Torus in the xz-plane: major radius ``major``, tube radius ``minor``."""

    center: jnp.ndarray  # (3,)
    major: jnp.ndarray  # ()
    minor: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        q = p - self.center
        ring = jnp.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - self.major
        return jnp.sqrt(ring**2 + q[..., 1] ** 2) - self.minor


@struct.dataclass
class Capsule(SDFNode):
    """Capsule between endpoints ``a`` and ``b`` with given ``radius``."""

    a: jnp.ndarray  # (3,)
    b: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        pa = p - self.a
        ba = self.b - self.a
        denom = jnp.maximum(jnp.sum(ba * ba, axis=-1), 1e-12)
        h = jnp.clip(jnp.sum(pa * ba, axis=-1) / denom, 0.0, 1.0)
        return vlength(pa - ba * h[..., None]) - self.radius


@struct.dataclass
class Cylinder(SDFNode):
    """Capped vertical (y-axis) cylinder, exact SDF (Quilez ``sdCappedCylinder``)."""

    center: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # ()
    half_height: jnp.ndarray  # ()

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        q = p - self.center
        radial = jnp.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - self.radius
        axial = jnp.abs(q[..., 1]) - self.half_height
        dx = jnp.maximum(radial, 0.0)
        dy = jnp.maximum(axial, 0.0)
        outside = vlength_safe(jnp.stack([dx, dy], axis=-1))
        inside = jnp.minimum(jnp.maximum(radial, axial), 0.0)
        return outside + inside


@struct.dataclass
class Ellipsoid(SDFNode):
    """Ellipsoid, Quilez bound-improved approximation (not exact off-axis)."""

    center: jnp.ndarray  # (3,)
    radii: jnp.ndarray  # (3,)

    def distance(self, p: jnp.ndarray) -> jnp.ndarray:
        q = p - self.center
        k0 = vlength(q / self.radii)
        k1 = vlength(q / (self.radii * self.radii))
        return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-12)


# ---------------------------------------------------------------------------
# Factory helpers — coerce python numbers to float32 leaves so every scene is
# a clean f32 pytree (ready for ravel_pytree / the Pallas parameter vector).
# ---------------------------------------------------------------------------


def sphere(center=(0.0, 0.0, 0.0), radius=1.0) -> Sphere:
    return Sphere(center=as_f32(center), radius=as_f32(radius))


def plane(normal=(0.0, 1.0, 0.0), offset=0.0) -> Plane:
    return Plane(normal=as_f32(normal), offset=as_f32(offset))


def ground_plane() -> Plane:
    """The reference's ground plane ``y = 0`` (``voxel_fragment.frag:66-71``)."""
    return plane((0.0, 1.0, 0.0), 0.0)


def box(half_extents=(1.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)) -> Box:
    return Box(center=as_f32(center), half_extents=as_f32(half_extents))


def round_box(half_extents=(1.0, 1.0, 1.0), corner_radius=0.1, center=(0.0, 0.0, 0.0)) -> RoundBox:
    return RoundBox(
        center=as_f32(center),
        half_extents=as_f32(half_extents),
        corner_radius=as_f32(corner_radius),
    )


def torus(major=1.0, minor=0.25, center=(0.0, 0.0, 0.0)) -> Torus:
    return Torus(center=as_f32(center), major=as_f32(major), minor=as_f32(minor))


def capsule(a=(0.0, 0.0, 0.0), b=(0.0, 1.0, 0.0), radius=0.25) -> Capsule:
    return Capsule(a=as_f32(a), b=as_f32(b), radius=as_f32(radius))


def cylinder(radius=0.5, half_height=0.5, center=(0.0, 0.0, 0.0)) -> Cylinder:
    return Cylinder(center=as_f32(center), radius=as_f32(radius), half_height=as_f32(half_height))


def ellipsoid(radii=(1.0, 0.5, 0.5), center=(0.0, 0.0, 0.0)) -> Ellipsoid:
    return Ellipsoid(center=as_f32(center), radii=as_f32(radii))
