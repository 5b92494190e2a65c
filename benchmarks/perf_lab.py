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


def make_fn(cfg, pc, mode="fwd", scene_name="reference"):
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene}[scene_name]()
    if mode == "fwd":
        fn = jax.jit(lambda sc: render_pallas(cfg, pc, sc, cam, light, mat))
    else:
        fn = jax.jit(jax.grad(lambda sc: jnp.sum(render_pallas(cfg, pc, sc, cam, light, mat))))
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
            best[name] = min(best[name], t)
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "stages"
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=1920, height=1080)
    suites = {"tiles": suite_tiles, "check": suite_check, "stages": suite_stages}
    if which == "all":
        for name, fn in suites.items():
            print(f"--- {name} ---")
            run(fn(cfg))
    else:
        run(suites[which](cfg))


if __name__ == "__main__":
    main()
