"""User-facing Pallas render entry points with a no-march backward pass.

Forward: the fused kernel (ops/render_kernel.py) — all marches on-chip.
Backward: **no march at all.**  The forward kernel already produced the three
quantities the gradient needs — hit distance ``t``, shadow and AO planes —
so the VJP re-traces only the *shading* expression in plain XLA with:

- ``t`` re-attached through the implicit-function theorem (``diff.py``
  semantics: dt = −(∇f·do + t·∇f·dd + f_θ·dθ)/(∇f·d)), giving scene and
  camera-pose gradients through the geometry with one extra SDF eval;
- shadow/AO planes treated as detached factors (``ShadowConfig.grad ==
  "detach"`` semantics — penumbra-shape gradients are dropped, everything
  else flows);
- normals, lighting and material gradients via ordinary AD of the shading
  formulas.

Cost: forward ≈ the marches (O(steps) SDF evals per ray, zero HBM traffic
between stages); backward ≈ one shading pass (O(1) SDF evals per ray).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sdf3d_tpu.camera import Camera, camera_rays
from sdf3d_tpu.config import RenderConfig
from sdf3d_tpu.diff import _DENOM_FLOOR
from sdf3d_tpu.lighting import Material, PointLight
from sdf3d_tpu.ops.render_kernel import PallasRenderConfig, render_kernel_forward
from sdf3d_tpu.render import shade_pixels
from sdf3d_tpu.sdf.node import SDFNode


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def render_pallas(
    cfg: RenderConfig,
    pc: PallasRenderConfig,
    scene: SDFNode,
    camera: Camera,
    light: PointLight,
    mat: Material,
) -> jnp.ndarray:
    """Fused Pallas render, differentiable; returns RGB (H, W, 3)."""
    rgb, _, _, _ = render_kernel_forward(scene, camera, light, mat, cfg, pc)
    return rgb


def _fwd(cfg, pc, scene, camera, light, mat):
    rgb, t, shadow, ao = render_kernel_forward(scene, camera, light, mat, cfg, pc)
    return rgb, (scene, camera, light, mat, t, shadow, ao)


def _reattach_t(cfg, scene, origins, directions, t0):
    """Value ``t0`` with the implicit-function VJP toward scene/rays.

    ``t0`` itself is a stored constant (cotangent 0); gradients w.r.t.
    scene/origins/directions come from the level-set relation at the hit.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
    def reattach(mc, scene, o, d, t):
        return t

    def fwd(mc, scene, o, d, t):
        return t, (scene, o, d, t)

    def bwd(mc, res, g):
        scene, o, d, t = res
        p = o + t[..., None] * d
        _, denom = jax.jvp(lambda q: scene.distance(q), (p,), (d,))
        hit = t <= mc.max_distance
        usable = hit & (jnp.abs(denom) >= _DENOM_FLOOR)
        u = jnp.where(usable, -g / jnp.where(usable, denom, 1.0), 0.0)
        _, pullback = jax.vjp(lambda sc, q: sc.distance(q), scene, p)
        scene_bar, p_bar = pullback(u)
        return scene_bar, p_bar, t[..., None] * p_bar, jnp.zeros_like(t)

    reattach.defvjp(fwd, bwd)
    return reattach(cfg.march, scene, origins, directions, t0)


def _bwd(cfg, pc, residuals, g_rgb):
    scene, camera, light, mat, t, shadow, ao = residuals

    def shade_path(scene_, camera_, light_, mat_):
        o, d = camera_rays(camera_, cfg.width, cfg.height, cfg.ray_mode)
        t_diff = _reattach_t(cfg, scene_, o, d, t)
        return shade_pixels(
            scene_, o, d, t_diff, light_, mat_, cfg,
            shadow_override=shadow, ao_override=ao,
        )

    _, pullback = jax.vjp(shade_path, scene, camera, light, mat)
    return pullback(g_rgb)


render_pallas.defvjp(_fwd, _bwd)


def render_pallas_depth(
    cfg: RenderConfig,
    scene: SDFNode,
    camera: Camera,
    pc: PallasRenderConfig = PallasRenderConfig(),
) -> jnp.ndarray:
    """Depth (hit distance) plane from the fused kernel, (H, W)."""
    from sdf3d_tpu.lighting import reference_light, reference_material

    _, t, _, _ = render_kernel_forward(scene, camera, reference_light(), reference_material(), cfg, pc)
    return t


def render_pallas_aux(
    cfg: RenderConfig,
    scene: SDFNode,
    camera: Camera,
    light: PointLight,
    mat: Material,
    pc: PallasRenderConfig = PallasRenderConfig(),
):
    """Non-differentiable forward returning (rgb, t, shadow, ao)."""
    return render_kernel_forward(scene, camera, light, mat, cfg, pc)
