"""Fused L2 loss + gradient kernel: the inverse-rendering hot path in ONE
Pallas launch and zero XLA round-trips.

The generic pallas fit step (ops/render_pallas.py custom VJP) costs, per
frame at 1080p: forward kernel (writes rgb + residual planes, 50 MB) → XLA
loss pass (reads rgb + target, reduces) → XLA cotangent pass (writes
``g_rgb = 2(img − target)``, 25 MB) → backward kernel (reads g_rgb +
residuals, 75 MB).  But the backward kernel *re-traces the whole shading
expression anyway* — and the march/shadow planes it re-attaches are exactly
what the forward kernel computes.  So for the L2 pixel loss the entire fit
step fuses into a single tile program:

    march (while_loop)  →  shadow march (while_loop)  →  AO
        →  value_and_grad of   Σ mask · (shade(params) − target)²

with ``jax.value_and_grad`` running at kernel-trace time (AD on the jaxpr
before Mosaic lowering, same mechanism as ops/render_bwd_kernel.py).  The
marches produce the residual planes *in registers*; the differentiated
shading re-attaches them via the implicit-function theorem
(render_bwd_kernel._shade_tile).  Per frame vs the two-launch version this
removes the rgb + residual HBM round trip (~100 MB at 1080p), the duplicate
ray-gen/normals/shading primal, and one kernel launch; HBM traffic drops to
target reads (25 MB) + one (8, 128) partial plane per tile (~1 MB).

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
    _round_up,
    _tile_pixel_planes,
    _tile_primal,
    pack_uniforms,
)
from sdf3d_tpu.ops.scene_program import (
    compile_scene,
    compile_scene_material,
    compile_scene_ray,
    scene_param_vector,
)


def _fit_tile_kernel(
    uni, prm, tr, tg, tb, out_ref, *, soa, soa_ray, mat_soa, n_params, cfg: RenderConfig, pc: PallasRenderConfig, wrt_uniforms: bool
):
    """Kernel body: primal march/shadow/AO, then value_and_grad of the masked
    tile L2 loss w.r.t. scalar params and uniforms; writes the
    (P + N_UNIFORMS + 1,) partial vector (grads then loss) scattered into an
    (8, 128) plane."""
    TH, TW = pc.tile_h, pc.tile_w
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)

    prm_vals = [prm[k] for k in range(n_params)]

    def getp(k):
        return prm_vals[k]

    def sdf(px, py, pz):
        return soa(px, py, pz, getp)

    rows, cols = _tile_pixel_planes(uni, TH, TW)
    # Padding mask in *local* (slab) coordinates: the grid covers the padded
    # slab, and padded lanes must contribute exact zeros (their target is
    # zero-padded; their absolute rows may even alias another slab's rows).
    riota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
    local_rows = i * TH + riota
    local_cols = j * TW + ciota
    mask = jnp.where(
        (local_rows < cfg.height) & (local_cols < cfg.width), f32(1.0), f32(0.0)
    )

    # ---- primal pipeline (identical to the forward kernel's) ----
    _, _, t0, _, _, shadow, ao = _tile_primal(uni, getp, sdf, soa_ray, rows, cols, cfg, pc)

    pv = tuple(prm_vals)
    uv = tuple(uni[k] for k in range(N_UNIFORMS))
    tgt = (tr[:, :], tg[:, :], tb[:, :])

    def tile_loss(pv_, uv_):
        # _shade_tile re-derives rays/normals/shading from the *fresh* pv_/uv_
        # arguments under AD; t0/shadow/ao enter as trace constants — exactly
        # the detached-shadow + implicit-function-t semantics of the fused
        # backward kernel (they were computed from the same prm/uni values).
        r, g, b = _shade_tile(
            pv_, uv_, gpos=(rows, cols), t0=t0, shadow_in=shadow, ao_in=ao,
            soa=soa, mat_soa=mat_soa, cfg=cfg, pc=pc,
        )
        return jnp.sum(
            mask * ((r - tgt[0]) ** 2 + (g - tgt[1]) ** 2 + (b - tgt[2]) ** 2)
        )

    if wrt_uniforms:
        loss, (d_pv, d_uv) = jax.value_and_grad(tile_loss, argnums=(0, 1))(pv, uv)
    else:
        # Scene-parameter-only fit (the fit.py/bench hot path): uniforms enter
        # as trace constants, so their reverse chains (ray-gen, light,
        # material) and plane reductions are dead code Mosaic never emits
        # (~0.07 ms/frame at 1080p).
        loss, d_pv = jax.value_and_grad(tile_loss, argnums=0)(pv, uv)
        d_uv = ()
    # Compile-time one-hot scatter (see render_bwd_kernel.py): component k
    # lands at (k // 128, k % 128); the tile loss rides as component G.
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    plane = jnp.zeros((8, 128), f32)
    comps = list(d_pv) + list(d_uv) + [loss]
    slots = list(range(len(d_pv) + len(d_uv))) + [n_params + N_UNIFORMS]
    for k, d in zip(slots, comps):
        sel = (r8 == k // 128) & (c8 == k % 128)
        plane = plane + jnp.where(sel, d, 0.0)
    out_ref[0, 0, :, :] = plane


@functools.partial(jax.jit, static_argnames=("scene_treedef", "leaf_shapes", "cfg", "pc", "wrt_uniforms"))
def fit_step_kernel(
    scene_treedef, leaf_shapes, params, uniforms, target, cfg: RenderConfig, pc: PallasRenderConfig, wrt_uniforms: bool = True
):
    """Single-launch fused fit step: returns ``(loss, g_params (P,),
    g_uniforms (N_UNIFORMS,))`` for the L2 pixel loss.

    ``target`` is planar (3, H, W) (a slab under sharding).  Padding expands
    to the tile grid with zeros; the in-kernel mask zeroes padded lanes.
    ``wrt_uniforms=False`` skips camera/light/material gradients (returned
    as zeros) — the scene-only fit hot path.
    """
    dummies = [jnp.zeros(shape, jnp.float32) for shape in leaf_shapes]
    scene = jax.tree_util.tree_unflatten(scene_treedef, dummies)
    soa = compile_scene(scene)
    soa_ray = compile_scene_ray(scene) if pc.ray_sdf else None
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

    kernel = functools.partial(
        _fit_tile_kernel, soa=soa, soa_ray=soa_ray, mat_soa=mat_soa, n_params=P, cfg=cfg, pc=pc,
        wrt_uniforms=wrt_uniforms,
    )
    n_taps = cfg.march.max_steps + 6 + (cfg.shadow.max_steps if cfg.shadow.enabled else 0) + (
        cfg.ao.samples if cfg.ao.enabled else 0
    )
    flops_per_eval = 40 * max(1, P // 4)
    cost = pl.CostEstimate(
        # ~3x the forward evals: primal marches + the value_and_grad of the
        # shading expression (primal + reverse).
        flops=3 * Hp * Wp * n_taps * flops_per_eval,
        bytes_accessed=Hp * Wp * 4 * 3 + grid[0] * grid[1] * 8 * 128 * 4,
        transcendentals=Hp * Wp * n_taps,
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
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=pc.interpret,
    )(uniforms, params, tr, tg, tb)

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
    wrt_uniforms: bool = True,
):
    """Fused ``(loss, (g_scene, g_camera, g_light, g_mat))`` for the L2 pixel
    loss — ONE kernel launch, no XLA loss/cotangent pass and no residual
    round trip.

    ``target`` is (H, W, 3) (matching ``cfg.height`` rows — a slab under
    sharding).  ``row0``/``rowstride`` may be traced (``lax.axis_index``
    under shard_map); 0 = unsharded defaults.  Gradients are exact matches
    of ``jax.value_and_grad`` through ``render_pallas`` with the same loss.
    ``wrt_uniforms=False`` skips the camera/light/material gradients (zero
    pytrees returned) — pass it when only scene grads are consumed
    (fit.py's scene fit) to skip their reverse chains in the kernel.
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

    target_planar = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))
    loss, g_params, g_uni = fit_step_kernel(
        treedef, leaf_shapes, params, uniforms, target_planar, cfg, pc,
        wrt_uniforms=wrt_uniforms,
    )
    (g_scene,) = p_vjp(g_params)
    g_cam, g_light, g_mat = u_vjp(g_uni)
    return loss, (g_scene, g_cam, g_light, g_mat)
