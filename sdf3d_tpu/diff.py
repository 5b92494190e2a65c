"""Implicit-function gradients through the sphere-trace march.

The reference renderer is not differentiable at all (fixed-function GLSL,
``/root/reference/Code/shader/voxel_fragment.frag``); differentiability is a
north-star capability (BASELINE config 3).  Naively reverse-differentiating
the 100-step march (a) needs O(steps) residual memory and (b) fails outright
for the early-exit ``while_loop``.  Instead the hit distance is treated as an
*implicit function* of everything upstream:

At convergence the march satisfies ``f(o + t·d; θ) = ε`` (the surface level
set).  Implicit differentiation gives

    dt = −(∇f·do + t·∇f·dd + f_θ·dθ) / (∇f·d)

so the VJP needs exactly **one extra SDF evaluation** (a jvp for the
denominator and a vjp for the numerator pullbacks) regardless of march length
— and works with the early-exit while_loop, since the primal march is opaque
to AD.

Miss rays (t > max_distance) and grazing rays (|∇f·d| ≈ 0) get zero gradient:
the hit distance of a miss is not a differentiable quantity.  Silhouette
motion is inherently invisible to interior-point gradients (both for this VJP
and for unrolled AD); finite differences across a silhouette measure the
moving-boundary term instead, so gradient-parity tests compare on
silhouette-free pixels (tests/test_diff.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdf3d_tpu.camera import Camera, camera_rays
from sdf3d_tpu.config import MarchConfig, RenderConfig
from sdf3d_tpu.lighting import Material, PointLight
from sdf3d_tpu.march import ray_min_sdf, sphere_trace
from sdf3d_tpu.render import shade_pixels
from sdf3d_tpu.sdf.node import SDFNode, vdot

#: Grazing-ray guard: |∇f·d| below this gets zero gradient instead of a blowup.
_DENOM_FLOOR = 1e-4


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def sphere_trace_implicit(
    cfg: MarchConfig, scene: SDFNode, origins: jnp.ndarray, directions: jnp.ndarray
) -> jnp.ndarray:
    """March distance with implicit-function VJP; primal == :func:`sphere_trace`."""
    return sphere_trace(scene.distance, origins, directions, cfg)


def _fwd(cfg, scene, origins, directions):
    t = sphere_trace(scene.distance, origins, directions, cfg)
    return t, (scene, origins, directions, t)


def _bwd(cfg, residuals, g):
    scene, origins, directions, t = residuals
    p = origins + t[..., None] * directions

    # Denominator ∇f·d via one jvp (forward-mode, no residual memory).
    _, denom = jax.jvp(lambda q: scene.distance(q), (p,), (directions,))

    hit = t <= cfg.max_distance
    usable = hit & (jnp.abs(denom) >= _DENOM_FLOOR)
    denom_safe = jnp.where(usable, denom, 1.0)
    u = jnp.where(usable, -g / denom_safe, 0.0)

    # One vjp pulls the cotangent back to scene params and to the hit point;
    # dp/do = I and dp/dd = t·I turn the point cotangent into ray cotangents.
    _, pullback = jax.vjp(lambda sc, q: sc.distance(q), scene, p)
    scene_bar, p_bar = pullback(u)
    o_bar = p_bar
    d_bar = t[..., None] * p_bar
    return scene_bar, o_bar, d_bar


sphere_trace_implicit.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def ray_min_sdf_diff(
    cfg: MarchConfig, scene: SDFNode, origins: jnp.ndarray, directions: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable closest approach of each ray to the scene, shape (...,).

    The silhouette gradient channel: interior-point gradients through the hit
    distance cannot see silhouette motion (module docstring), but the ray's
    minimum SDF can — ``∂min_s/∂θ = ∂f/∂θ`` evaluated at the closest-approach
    point (Danskin/envelope theorem for the min over the trajectory, treating
    the trajectory itself as data).  One extra SDF eval in the VJP.
    ``sigmoid(−min_s/β)`` is a smooth coverage for silhouette-aware losses
    (fit.py).
    """
    min_s, _ = ray_min_sdf(scene.distance, origins, directions, cfg)
    return min_s


def _minsdf_fwd(cfg, scene, origins, directions):
    min_s, t_min = ray_min_sdf(scene.distance, origins, directions, cfg)
    return min_s, (scene, origins, directions, t_min)


def _minsdf_bwd(cfg, residuals, g):
    scene, origins, directions, t_min = residuals
    p = origins + t_min[..., None] * directions
    _, pullback = jax.vjp(lambda sc, q: sc.distance(q), scene, p)
    scene_bar, p_bar = pullback(g)
    # p = o + t_min·d with t_min treated as data (envelope theorem).
    return scene_bar, p_bar, t_min[..., None] * p_bar


ray_min_sdf_diff.defvjp(_minsdf_fwd, _minsdf_bwd)


def coverage(
    cfg: MarchConfig,
    scene: SDFNode,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    beta: float | None = None,
) -> jnp.ndarray:
    """Soft hit-coverage per ray in (0, 1): ``sigmoid((2ε − min_s)/β)``.

    ≈1 where the ray hits, →0 away from surfaces, smooth across silhouettes
    and differentiable w.r.t. scene/ray parameters — the term that restores
    the silhouette force in inverse rendering.

    Calibration matters: the march stops as soon as ``f < ε``, so a hit ray's
    ``min_s`` lands in ``(0, ε)`` — an *unshifted* ``σ(−min_s/β)`` would read
    ~0.4 for hits, leaving a constant deficit against a binary object mask
    that pushes geometry toward the camera.  Shifting by ``2ε`` puts hits at
    ``σ(≥ε/β)``; the default ``β = ε/2.5`` makes that ≥0.92 while staying
    smooth over ~β world units at silhouettes.
    """
    beta = cfg.epsilon / 2.5 if beta is None else beta
    min_s = ray_min_sdf_diff(cfg, scene, origins, directions)
    return jax.nn.sigmoid((2.0 * cfg.epsilon - min_s) / beta)


def render_rays_diff(
    scene: SDFNode,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    light: PointLight,
    mat: Material,
    config: RenderConfig,
) -> jnp.ndarray:
    """Differentiable march + shade for an arbitrary ray bundle.

    Identical primal output to :func:`sdf3d_tpu.render.render_rays`; gradients
    w.r.t. scene / camera / light / material flow through the implicit VJP
    (march) and plain AD (normals, shadow, AO, shading).  Prefer
    ``normals="autodiff"`` in the config here — exact, and its second-order
    terms are what carry surface-orientation gradients.
    """
    distances = sphere_trace_implicit(config.march, scene, origins, directions)
    return shade_pixels(scene, origins, directions, distances, light, mat, config)


@partial(jax.jit, static_argnames=("config",))
def render_diff(
    scene: SDFNode,
    camera: Camera,
    light: PointLight,
    mat: Material,
    config: RenderConfig,
) -> jnp.ndarray:
    """Differentiable full-image render, (H, W, 3).

    The entry point for inverse rendering: ``jax.grad`` of any loss of this
    output w.r.t. ``scene`` / ``camera`` / ``light`` / ``mat`` works, with
    march gradients via the implicit-function VJP (O(1) memory, early-exit
    compatible).
    """
    origins, directions = camera_rays(camera, config.width, config.height, config.ray_mode)
    return render_rays_diff(scene, origins, directions, light, mat, config)


def depth_implicit(scene: SDFNode, camera: Camera, config: RenderConfig) -> jnp.ndarray:
    """Differentiable depth map (H, W) via the implicit VJP."""
    origins, directions = camera_rays(camera, config.width, config.height, config.ray_mode)
    return sphere_trace_implicit(config.march, scene, origins, directions)
