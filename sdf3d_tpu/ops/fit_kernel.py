"""Fused L2 loss + gradient kernel: the inverse-rendering hot path in two
Pallas launches and zero XLA round-trips.

The generic pallas fit step (ops/render_pallas.py custom VJP) costs, per
frame at 1080p: forward kernel (writes rgb + residual planes, 50 MB) → XLA
loss pass (reads rgb + target, reduces) → XLA cotangent pass (writes
``g_rgb = 2(img − target)``, 25 MB) → backward kernel (reads g_rgb +
residuals, 75 MB).  But the backward kernel *re-traces the whole shading
expression anyway* — it can recompute the rgb primal in-register.  So for
the L2 pixel loss there is nothing for XLA to do: give the backward kernel
the **target** planes instead of a cotangent and let it compute

    tile_loss = Σ mask · (shade(params) − target)²

and differentiate *that* (``jax.value_and_grad`` at kernel-trace time, same
mechanism as ops/render_bwd_kernel.py).  Per frame this removes the XLA
loss + cotangent passes and ~75 MB of HBM traffic, and the loss reduction
rides the gradient partial-sum plane for free (slot ``P + N_UNIFORMS``).

``mask`` zeroes padding lanes (local rows ≥ slab height, cols ≥ W) so padded
tiles contribute exact zeros to both loss and grads — required because the
target is zero-padded, which would otherwise make sky padding "visible".

Used by fit.py (engine='pallas', loss='l2', no silhouette term) single-mesh
and sharded (the kernel honors the same row0/rowstride uniforms as the
forward — parallel/shard_render.py), and by the driver benchmark
(sdf3d_tpu/bench.py), whose fwd_bwd metric is exactly this fit step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdf3d_tpu.config import RenderConfig
from sdf3d_tpu.ops.render_bwd_kernel import _shade_tile
from sdf3d_tpu.ops.render_kernel import (
    N_UNIFORMS,
    PallasRenderConfig,
    _U_K,
    _U_ROW0,
    _U_ROWSTRIDE,
    _render_kernel_call,
    _round_up,
    pack_uniforms,
)
from sdf3d_tpu.ops.scene_program import compile_scene, scene_param_vector


def _loss_grad_tile_kernel(
    uni, prm, tr, tg, tb, t_in, sh_in, ao_in, out_ref, *, soa, mat_soa, n_params, cfg: RenderConfig, pc: PallasRenderConfig
):
    """Kernel body: value_and_grad of the masked tile L2 loss w.r.t. scalar
    params and uniforms; writes the (P + N_UNIFORMS + 1,) partial vector
    (grads then loss) scattered into an (8, 128) SMEM-friendly plane."""
    TH, TW = pc.tile_h, pc.tile_w
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Absolute pixel rows via row0/rowstride (render_kernel.py:158 parity).
    riota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
    rows = uni[_U_ROW0] + i.astype(f32) * uni[_U_ROWSTRIDE] + riota.astype(f32)
    cols = (j * TW + ciota).astype(f32)
    # Padding mask in *local* (slab) coordinates: the grid covers the padded
    # slab, and padded lanes must contribute exact zeros (their target is
    # zero-padded; their absolute rows may even alias another slab's rows).
    local_rows = i * TH + riota
    local_cols = j * TW + ciota
    mask = jnp.where(
        (local_rows < cfg.height) & (local_cols < cfg.width), f32(1.0), f32(0.0)
    )

    pv = tuple(prm[k] for k in range(n_params))
    uv = tuple(uni[k] for k in range(N_UNIFORMS))
    t0 = t_in[:, :]
    shp = sh_in[:, :]
    aop = ao_in[:, :]
    tgt = (tr[:, :], tg[:, :], tb[:, :])

    def tile_loss(pv_, uv_):
        r, g, b = _shade_tile(
            pv_, uv_, gpos=(rows, cols), t0=t0, shadow_in=shp, ao_in=aop,
            soa=soa, mat_soa=mat_soa, cfg=cfg, pc=pc,
        )
        return jnp.sum(
            mask * ((r - tgt[0]) ** 2 + (g - tgt[1]) ** 2 + (b - tgt[2]) ** 2)
        )

    loss, (d_pv, d_uv) = jax.value_and_grad(tile_loss, argnums=(0, 1))(pv, uv)
    # Compile-time one-hot scatter (see render_bwd_kernel.py): component k
    # lands at (k // 128, k % 128); the tile loss rides as component G.
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    plane = jnp.zeros((8, 128), f32)
    for k, d in enumerate(list(d_pv) + list(d_uv) + [loss]):
        sel = (r8 == k // 128) & (c8 == k % 128)
        plane = plane + jnp.where(sel, d, 0.0)
    out_ref[0, 0, :, :] = plane


@functools.partial(jax.jit, static_argnames=("scene_treedef", "leaf_shapes", "cfg", "pc"))
def render_loss_grad_kernel(
    scene_treedef, leaf_shapes, params, uniforms, target, t, shadow, ao, cfg: RenderConfig, pc: PallasRenderConfig
):
    """Fused loss+backward: returns ``(loss, g_params (P,), g_uniforms)``.

    ``target`` is planar (3, H, W); ``t``/``shadow``/``ao`` the forward
    kernel's residual planes (cropped to H×W).  Padding re-expands to the
    forward's tile grid; the in-kernel mask zeroes padded lanes.
    """
    dummies = [jnp.zeros(shape, jnp.float32) for shape in leaf_shapes]
    scene = jax.tree_util.tree_unflatten(scene_treedef, dummies)
    soa = compile_scene(scene)
    from sdf3d_tpu.ops.scene_program import compile_scene_material
    from sdf3d_tpu.sdf.materials import scene_has_materials

    mat_soa = compile_scene_material(scene) if scene_has_materials(scene) else None
    H, W = cfg.height, cfg.width
    TH, TW = pc.tile_h, pc.tile_w
    Hp, Wp = _round_up(H, TH), _round_up(W, TW)
    grid = (Hp // TH, Wp // TW)
    P = int(params.shape[0])
    G = P + N_UNIFORMS
    if G + 1 > 8 * 128:
        raise ValueError(
            f"scene has {P} params; fused loss kernel supports up to {8 * 128 - N_UNIFORMS - 1}"
        )

    stride = jnp.where(
        uniforms[_U_ROWSTRIDE] > 0.0, uniforms[_U_ROWSTRIDE], jnp.float32(TH)
    )
    uniforms = uniforms.at[_U_ROWSTRIDE].set(stride)

    pad = ((0, Hp - H), (0, Wp - W))
    tr = jnp.pad(target[0], pad)
    tg = jnp.pad(target[1], pad)
    tb = jnp.pad(target[2], pad)
    t_p = jnp.pad(t, pad, constant_values=2.0 * cfg.march.max_distance)
    sh_p = jnp.pad(shadow, pad, constant_values=1.0)
    ao_p = jnp.pad(ao, pad, constant_values=1.0)

    kernel = functools.partial(
        _loss_grad_tile_kernel, soa=soa, mat_soa=mat_soa, n_params=P, cfg=cfg, pc=pc
    )
    plane = lambda: pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane(),
            plane(),
            plane(),
            plane(),
            plane(),
            plane(),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=pc.interpret,
    )(uniforms, params, tr, tg, tb, t_p, sh_p, ao_p)

    total = jnp.sum(partials, axis=(0, 1)).reshape(-1)
    return total[G], total[:P], total[P:G]


def fused_l2_eligible(cfg: RenderConfig, scene) -> bool:
    """True when the fused loss+grad path applies: default detached-shadow
    gradients, kernel-supported normals, and a scene every node of which has
    a Mosaic emitter (same conditions as the fused backward)."""
    from sdf3d_tpu.ops.render_pallas import _scene_compiles

    return (
        not (cfg.shadow.enabled and cfg.shadow.grad == "ad")
        and cfg.normals in ("central", "tetrahedron")
        and _scene_compiles(scene)
    )


def l2_loss_and_grads(
    cfg: RenderConfig,
    pc: PallasRenderConfig,
    scene,
    camera,
    light,
    mat,
    target,
    row0=0.0,
    rowstride=0.0,
):
    """Fused ``(loss, (g_scene, g_camera, g_light, g_mat))`` for the L2 pixel
    loss — two kernel launches, no XLA loss/cotangent pass.

    ``target`` is (H, W, 3) (matching ``cfg.height`` rows — a slab under
    sharding).  ``row0``/``rowstride`` may be traced (``lax.axis_index``
    under shard_map); 0 = unsharded defaults.  Gradients are exact matches
    of ``jax.value_and_grad`` through ``render_pallas`` with the same loss.
    """
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    leaf_shapes = tuple(jnp.shape(l) for l in leaves)
    params, p_vjp = jax.vjp(scene_param_vector, scene)

    def pack(cam_, light_, mat_):
        u = pack_uniforms(cam_, light_, mat_, cfg.ray_mode)
        return u.at[_U_K].set(jnp.asarray(cfg.shadow.k, jnp.float32))

    uniforms, u_vjp = jax.vjp(pack, camera, light, mat)
    uniforms = uniforms.at[_U_ROW0].set(jnp.asarray(row0, jnp.float32))
    uniforms = uniforms.at[_U_ROWSTRIDE].set(jnp.asarray(rowstride, jnp.float32))

    _, t, sh, ao = _render_kernel_call(treedef, leaf_shapes, params, uniforms, cfg, pc)
    target_planar = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))
    loss, g_params, g_uni = render_loss_grad_kernel(
        treedef, leaf_shapes, params, uniforms, target_planar, t, sh, ao, cfg, pc
    )
    (g_scene,) = p_vjp(g_params)
    g_cam, g_light, g_mat = u_vjp(g_uni)
    return loss, (g_scene, g_cam, g_light, g_mat)
