"""Interleaved A/B kernel measurements on the live chip.

Measures a list of named render configurations round-robin (so a transient
slow window on the shared chip cannot bias one config), reporting min
amortized ms/frame per config.  Used to drive kernel optimization decisions;
results land in docs/performance.md.

Usage: python -m benchmarks.perf_lab [suite]   (suite: tiles | check | stages | all)
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

import sdf3d_tpu as s
from sdf3d_tpu.ops import PallasRenderConfig, render_pallas
from sdf3d_tpu.utils.profiling import benchmark_fn


#: Frames pipelined per dispatch — measurements are per-frame device compute,
#: not the ~1.3 ms relay dispatch floor (see sdf3d_tpu/bench.py docstring).
FRAMES = 8


def make_fn(cfg, pc, mode="fwd", scene_name="reference"):
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene}[scene_name]()
    if mode == "fwd":
        from sdf3d_tpu.ops.render_kernel import render_kernel_forward

        cams = [s.Camera.orbit(azimuth_deg=360.0 * k / FRAMES) for k in range(FRAMES)]
        cameras = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)

        fn = jax.jit(
            lambda sc: jax.lax.map(
                lambda c: render_kernel_forward(sc, c, light, mat, cfg, pc)[0].mean(), cameras
            )
        )
    elif mode == "fwd_scan":
        # Forward-only at the reference camera, serially dependent: each
        # frame's checksum nudges a scene param so XLA cannot hoist frames.
        @jax.jit
        def fn(sc):
            def body(sc_, _):
                m = render_pallas(cfg, pc, sc_, cam, light, mat).mean()
                leaves, td = jax.tree_util.tree_flatten(sc_)
                leaves = [l + 1e-12 * m for l in leaves]
                return jax.tree_util.tree_unflatten(td, leaves), m

            return jax.lax.scan(body, sc, None, length=FRAMES)[1]
    elif mode == "fit":
        # The single-launch fused fit step (ops/fit_kernel.py) — the exact
        # bench.py fwd_bwd workload.
        from sdf3d_tpu.ops.fit_kernel import l2_loss_and_grads

        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        @jax.jit
        def fn(sc):
            def body(sc_, _):
                val, (g, *_ignored) = l2_loss_and_grads(
                    cfg, pc, sc_, cam, light, mat, target, wrt_uniforms=False
                )
                return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, sc_, g), val

            return jax.lax.scan(body, sc, None, length=FRAMES)[1]
    else:
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss(sc):
            img = render_pallas(cfg, pc, sc, cam, light, mat)
            return jnp.sum((img - target) ** 2)

        @jax.jit
        def fn(sc):
            def body(sc_, _):
                val, g = jax.value_and_grad(loss)(sc_)
                return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, sc_, g), val

            return jax.lax.scan(body, sc, None, length=FRAMES)[1]

    return fn, scene


def run(cases: dict[str, tuple], rounds: int = 4, iters: int = 10):
    """cases: name -> (cfg, pc, mode). Interleaved min-of-rounds."""
    fns = {}
    for name, (cfg, pc, mode) in cases.items():
        fns[name] = make_fn(cfg, pc, mode)
    best = {name: float("inf") for name in cases}
    for r in range(rounds):
        for name, (fn, scene) in fns.items():
            t = benchmark_fn(fn, scene, warmup=2 if r == 0 else 0, iters=iters)
            best[name] = min(best[name], t / FRAMES)
        time.sleep(0.02)
    width = max(len(n) for n in best)
    for name, t in best.items():
        cfg = cases[name][0]
        rays = cfg.width * cfg.height / t
        print(f"{name:<{width}}  {t * 1e3:7.3f} ms  {rays / 1e6:8.1f} Mrays/s")
    return best


def suite_tiles(cfg):
    return {
        f"tile_{th}x{tw}": (cfg, PallasRenderConfig(tile_h=th, tile_w=tw), "fwd")
        for th, tw in [(16, 512), (8, 512), (8, 1024), (16, 1024), (16, 256), (32, 512), (8, 2048)]
    }


def suite_check(cfg):
    return {
        f"chk_{c}": (cfg, PallasRenderConfig(check_every=c), "fwd")
        for c in [5, 10, 20, 25, 50]
    }


def suite_stages(cfg):
    no_shadow = dataclasses.replace(cfg, shadow=dataclasses.replace(cfg.shadow, enabled=False))
    pc = PallasRenderConfig()
    return {
        "fwd": (cfg, pc, "fwd"),
        "fwd_noshadow": (no_shadow, pc, "fwd"),
        "fwd_bwd": (cfg, pc, "fwd_bwd"),
    }


def suite_breakdown(cfg):
    """Separate march-variable, shadow-variable and fixed (raygen/normals/
    shade/dispatch) cost: clamp each march to 1 step and difference."""
    m1 = dataclasses.replace(cfg, march=dataclasses.replace(cfg.march, max_steps=1))
    s1 = dataclasses.replace(cfg, shadow=dataclasses.replace(cfg.shadow, max_steps=1))
    both = dataclasses.replace(m1, shadow=dataclasses.replace(cfg.shadow, max_steps=1))
    pc = PallasRenderConfig()
    return {
        "full": (cfg, pc, "fwd"),
        "march1": (m1, pc, "fwd"),
        "shadow1": (s1, pc, "fwd"),
        "march1_shadow1": (both, pc, "fwd"),
        "chk20": (cfg, PallasRenderConfig(check_every=20), "fwd"),
        "chk20_bwd": (cfg, PallasRenderConfig(check_every=20), "fwd_bwd"),
    }



def suite_refcam(cfg):
    """Reference-camera costs, serially dependent (comparable to bench.py):
    fwd-only scan vs fwd+bwd scan, default vs chk20/32x512 tiles."""
    pc0 = PallasRenderConfig()
    pc1 = PallasRenderConfig(check_every=20, tile_h=32, tile_w=512)
    return {
        "fwdscan_default": (cfg, pc0, "fwd_scan"),
        "fwdscan_chk20_32x512": (cfg, pc1, "fwd_scan"),
        "fwdbwd_default": (cfg, pc0, "fwd_bwd"),
        "fwdbwd_chk20_32x512": (cfg, pc1, "fwd_bwd"),
    }


def suite_fit_tiles(cfg):
    """Tile/check sweep for the single-launch fused fit kernel (the bench.py
    fwd_bwd workload) — the bwd AD section shifts the optimum vs fwd-only.
    Round-5 additions: zero-column-padding widths (1920 = 5·384 = 3·640 —
    the default 512 pads 1920→2048, 6.7% dead lanes) and th=24 (45·24 =
    1080 exactly, zero row padding)."""
    cases = {}
    for th, tw in [(16, 512), (8, 512), (32, 512), (16, 1024), (8, 1024),
                   (16, 256), (16, 640), (24, 640), (8, 640), (16, 384),
                   (24, 512), (32, 640)]:
        cases[f"fit_{th}x{tw}"] = (cfg, PallasRenderConfig(tile_h=th, tile_w=tw), "fit")
    for c in [10, 25, 50]:
        cases[f"fit_chk{c}"] = (cfg, PallasRenderConfig(check_every=c), "fit")
    return cases


def suite_stop(cfg):
    """Stop-predicate thinning (pc.stop_every, fast-profile knob) and its
    interaction with check_every — fwd and fit."""
    cases = {}
    for se, chk in [(1, 20), (2, 20), (4, 20), (2, 10), (5, 20)]:
        pc = PallasRenderConfig(check_every=chk, stop_every=se)
        cases[f"fwd_se{se}_chk{chk}"] = (cfg, pc, "fwd_scan")
        cases[f"fit_se{se}_chk{chk}"] = (cfg, pc, "fit")
    return cases


def suite_fit_stages(cfg):
    """Stage isolation for the fused fit kernel: clamp each march to 1 step
    to separate march / shadow / AD-shading costs."""
    m1 = dataclasses.replace(cfg, march=dataclasses.replace(cfg.march, max_steps=1))
    s1 = dataclasses.replace(cfg, shadow=dataclasses.replace(cfg.shadow, max_steps=1))
    both = dataclasses.replace(m1, shadow=dataclasses.replace(cfg.shadow, max_steps=1))
    pc = PallasRenderConfig()
    return {
        "fit_full": (cfg, pc, "fit"),
        "fit_march1": (m1, pc, "fit"),
        "fit_shadow1": (s1, pc, "fit"),
        "fit_march1_shadow1": (both, pc, "fit"),
        "fwd_full": (cfg, pc, "fwd_scan"),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "stages"
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=1920, height=1080)
    suites = {"tiles": suite_tiles, "check": suite_check, "stages": suite_stages, "breakdown": suite_breakdown, "refcam": suite_refcam, "fit_tiles": suite_fit_tiles, "fit_stages": suite_fit_stages, "stop": suite_stop}
    if which == "all":
        for name, fn in suites.items():
            print(f"--- {name} ---")
            run(fn(cfg))
    else:
        run(suites[which](cfg))


if __name__ == "__main__":
    main()
