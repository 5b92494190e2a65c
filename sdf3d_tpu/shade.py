"""Shading: Blinn-Phong with soft shadows (and a Lambertian mode).

Replicates the lighting block of the reference fragment shader
(``/root/reference/Code/shader/voxel_fragment.frag:199-210``), including its
quirks:

- the light *color* is set but never used (``:183``) — only the scalar
  ambient/diffuse/specular intensities modulate the material colors;
- there is **no miss branch**: rays that exceeded the march range are still
  shaded at their far point (handled by the caller in ``render.py``);
- ``reflect()`` is computed but unused (``:202``) — Blinn-Phong's halfway
  vector drives the specular term; we simply omit the dead computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from sdf3d_tpu.lighting import Material, PointLight
from sdf3d_tpu.sdf.node import vdot, vnormalize


def blinn_phong(
    points: jnp.ndarray,  # (..., 3) surface points
    normals: jnp.ndarray,  # (..., 3)
    eye: jnp.ndarray,  # (3,) or broadcastable
    light: PointLight,
    mat: Material,
    shadow: jnp.ndarray,  # (...,) soft-shadow factor in [0,1]
    ao: jnp.ndarray | None = None,  # (...,) ambient-occlusion factor in [0,1]
) -> jnp.ndarray:
    """Blinn-Phong shade; returns RGB of shape ``(..., 3)``.

    Term-for-term with ``voxel_fragment.frag:200-210``:
    ``view = normalize(eye − P)``, ``incident = normalize(light.pos − P)``,
    ``halfway = normalize(incident + view)``,
    ``spec = max(dot(N, halfway), 0)^shininess`` (``:204``),
    ``diff = clamp(dot(N, incident), 0, 1) · shadow`` (``:205``),
    ``color = amb·M.amb + diff·M.dif + spec·M.ref`` (``:206-210``).
    AO (no reference counterpart) scales the ambient term when provided.
    """
    view = vnormalize(eye - points)
    incident = vnormalize(light.position - points)
    halfway = vnormalize(incident + view)
    spec_i = jnp.maximum(vdot(normals, halfway), 0.0) ** mat.shininess
    diff_i = jnp.clip(vdot(normals, incident), 0.0, 1.0) * shadow
    ambient_scale = light.ambient if ao is None else light.ambient * ao
    ambient = ambient_scale[..., None] * mat.ambient if ao is not None else light.ambient * mat.ambient
    return ambient + diff_i[..., None] * mat.diffuse + spec_i[..., None] * mat.specular


def lambert(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light: PointLight,
    mat: Material,
    shadow: jnp.ndarray,
) -> jnp.ndarray:
    """Plain Lambertian shade (BASELINE config 1): ambient + shadowed diffuse."""
    incident = vnormalize(light.position - points)
    diff_i = jnp.clip(vdot(normals, incident), 0.0, 1.0) * shadow
    return light.ambient * mat.ambient + diff_i[..., None] * mat.diffuse
