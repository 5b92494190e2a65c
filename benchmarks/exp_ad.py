"""One-off experiment: where does the fused fit kernel's fixed cost live?

Variants of ops/fit_kernel.py's tile program, measured interleaved at 1080p
with march/shadow clamped to 1 step (so only the fixed section varies):

  full      — value_and_grad wrt (params, uniforms)        [the shipped kernel]
  primal    — tile loss only, no AD
  wrt_p     — value_and_grad wrt params only
  noscatter — full AD, but write only the loss component
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sdf3d_tpu as s
from sdf3d_tpu.ops.render_bwd_kernel import _shade_tile
from sdf3d_tpu.ops.render_kernel import (
    N_UNIFORMS,
    PallasRenderConfig,
    _U_K,
    _round_up,
    _tile_pixel_planes,
    _tile_primal,
    pack_uniforms,
)
from sdf3d_tpu.ops.scene_program import compile_scene, compile_scene_ray, scene_param_vector
from sdf3d_tpu.utils.profiling import benchmark_fn

FRAMES = 8


def make_variant(variant: str, cfg, pc):
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = s.reference_scene()
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    leaf_shapes = tuple(jnp.shape(l) for l in leaves)
    soa = compile_scene(scene)
    soa_ray = compile_scene_ray(scene)

    H, W = cfg.height, cfg.width
    TH, TW = pc.tile_h, pc.tile_w
    Hp, Wp = _round_up(H, TH), _round_up(W, TW)
    grid = (Hp // TH, Wp // TW)

    def kernel(uni, prm, tr, tg, tb, out_ref, *, n_params):
        f32 = jnp.float32
        i = pl.program_id(0)
        j = pl.program_id(1)
        prm_vals = [prm[k] for k in range(n_params)]
        getp = lambda k: prm_vals[k]
        sdf = lambda px, py, pz: soa(px, py, pz, getp)
        rows, cols = _tile_pixel_planes(uni, TH, TW)
        riota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        mask = jnp.where((i * TH + riota < cfg.height) & (j * TW + ciota < cfg.width), f32(1.0), f32(0.0))
        _, _, t0, _, _, shadow, ao = _tile_primal(uni, getp, sdf, soa_ray, rows, cols, cfg, pc)
        pv = tuple(prm_vals)
        uv = tuple(uni[k] for k in range(N_UNIFORMS))
        if variant == "empty_noin":
            out_ref[0, 0, :, :] = jnp.zeros((8, 128), f32) + jnp.sum(mask)
            return
        tgt = (tr[:, :], tg[:, :], tb[:, :])

        def tile_loss(pv_, uv_):
            r, g, b = _shade_tile(pv_, uv_, gpos=(rows, cols), t0=t0, shadow_in=shadow, ao_in=ao,
                                  soa=soa, mat_soa=None, cfg=cfg, pc=pc)
            return jnp.sum(mask * ((r - tgt[0]) ** 2 + (g - tgt[1]) ** 2 + (b - tgt[2]) ** 2))

        if variant == "empty":
            # Same grid/blockspec/DMA pattern, near-zero compute: isolates
            # pipeline + launch overhead.
            comps = [jnp.sum(mask * (tgt[0] + tgt[1] + tgt[2]))]
        elif variant == "empty_noin":
            # No plane inputs consumed: launch overhead without target DMAs.
            comps = [jnp.sum(mask)]
        elif variant == "nopow":
            # Full AD but shininess forced to an integer square chain
            # (ndoth^12 = ((x^2·x)^2)^2 = 4 muls) — isolates jnp.power cost.
            import sdf3d_tpu.ops.render_bwd_kernel as rbk
            orig_power = jnp.power

            def cheap_pow(x, s):
                x3 = x * x * x
                return (x3 * x3) * (x3 * x3)

            jnp.power = cheap_pow
            try:
                loss, (d_pv, d_uv) = jax.value_and_grad(tile_loss, argnums=(0, 1))(pv, uv)
            finally:
                jnp.power = orig_power
            comps = list(d_pv) + list(d_uv) + [loss]
        elif variant == "shade_only":
            # No marches: t0/shadow/ao faked; AD shading + loss only.
            loss, (d_pv, d_uv) = jax.value_and_grad(
                lambda pv_, uv_: jnp.sum(mask * sum(
                    (c - tg_) ** 2 for c, tg_ in zip(
                        _shade_tile(pv_, uv_, gpos=(rows, cols),
                                    t0=jnp.full((TH, TW), 2.0, f32),
                                    shadow_in=jnp.ones((TH, TW), f32),
                                    ao_in=jnp.ones((TH, TW), f32),
                                    soa=soa, mat_soa=None, cfg=cfg, pc=pc),
                        tgt)
                )), argnums=(0, 1))(pv, uv)
            comps = list(d_pv) + list(d_uv) + [loss]
        elif variant == "primal":
            loss = tile_loss(pv, uv)
            comps = [loss]
        elif variant == "wrt_p":
            loss, d_pv = jax.value_and_grad(tile_loss, argnums=0)(pv, uv)
            comps = list(d_pv) + [loss]
        else:
            loss, (d_pv, d_uv) = jax.value_and_grad(tile_loss, argnums=(0, 1))(pv, uv)
            comps = [loss] if variant == "noscatter" else list(d_pv) + list(d_uv) + [loss]

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        plane = jnp.zeros((8, 128), f32)
        for k, d in enumerate(comps):
            plane = plane + jnp.where((r8 == k // 128) & (c8 == k % 128), d, 0.0)
        out_ref[0, 0, :, :] = plane

    @jax.jit
    def step(sc, target_planar):
        params = scene_param_vector(sc)
        uniforms = pack_uniforms(cam, light, mat, cfg.ray_mode)
        uniforms = uniforms.at[_U_K].set(jnp.asarray(cfg.shadow.k, jnp.float32))
        from sdf3d_tpu.ops.render_kernel import _U_ROWSTRIDE
        uniforms = uniforms.at[_U_ROWSTRIDE].set(jnp.float32(TH))
        pad = ((0, Hp - H), (0, Wp - W))
        tr = jnp.pad(target_planar[0], pad)
        tg = jnp.pad(target_planar[1], pad)
        tb = jnp.pad(target_planar[2], pad)
        pf = lambda: pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        if variant == "empty_noin":
            def kern_noin(uni, prm, out_ref, n_params=int(params.shape[0])):
                return kernel(uni, prm, None, None, None, out_ref, n_params=n_params)

            partials = pl.pallas_call(
                kern_noin,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
            )(uniforms, params)
        elif variant == "tgt3":
            def kern3(uni, prm, tgt_ref, out_ref, n_params=int(params.shape[0])):
                return kernel(uni, prm, tgt_ref[0], tgt_ref[1], tgt_ref[2], out_ref, n_params=n_params)

            tgt_stack = jnp.stack([tr, tg, tb])
            partials = pl.pallas_call(
                kern3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
            )(uniforms, params, tgt_stack)
        else:
            partials = pl.pallas_call(
                functools.partial(kernel, n_params=int(params.shape[0])),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.SMEM), pf(), pf(), pf()],
                out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
            )(uniforms, params, tr, tg, tb)
        return jnp.sum(partials, axis=(0, 1)).reshape(-1)

    target = jnp.zeros((3, H, W), jnp.float32)

    @jax.jit
    def fn(sc):
        def body(sc_, _):
            tot = step(sc_, target)
            leaves_, td = jax.tree_util.tree_flatten(sc_)
            leaves_ = [l + 1e-30 * tot[-1] for l in leaves_]
            return jax.tree_util.tree_unflatten(td, leaves_), tot[-1]

        return jax.lax.scan(body, sc, None, length=FRAMES)[1]

    return fn, scene


def main():
    import sys
    base = dataclasses.replace(s.REFERENCE_CONFIG, width=1920, height=1080)
    short = dataclasses.replace(
        base,
        march=dataclasses.replace(base.march, max_steps=1),
        shadow=dataclasses.replace(base.shadow, max_steps=1),
    )
    if len(sys.argv) > 1 and sys.argv[1] == "full":
        cfg, pc = base, PallasRenderConfig()
    else:
        # check_every=1 so max_steps=1 really means one evaluated step.
        cfg, pc = short, PallasRenderConfig(check_every=1)
    fns = {v: make_variant(v, cfg, pc) for v in ["full", "wrt_p", "nopow", "primal"]}
    best = {v: float("inf") for v in fns}
    for r in range(4):
        for v, (fn, scene) in fns.items():
            t = benchmark_fn(fn, scene, warmup=2 if r == 0 else 0, iters=10)
            best[v] = min(best[v], t / FRAMES)
        time.sleep(0.02)
    for v, t in best.items():
        print(f"{v:<10} {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
