"""Tile-shape autotuner for the fused Pallas kernel (run on real TPU).

Sweeps (tile_h, tile_w) and reports rays/s per shape; bigger tiles amortize
grid overhead but mix unconverged rays (delaying whole-tile early exit), so
the optimum is workload-dependent (docs/performance.md).

    python -m benchmarks.autotune --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="reference")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    import jax

    if jax.default_backend() != "tpu" and not args.interpret:
        print("no TPU: forcing --interpret on CPU", file=sys.stderr)
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        args.interpret = True
        args.width, args.height = min(args.width, 256), min(args.height, 192)

    import dataclasses

    import sdf3d_tpu as s
    from sdf3d_tpu.ops import PallasRenderConfig
    from sdf3d_tpu.ops.render_kernel import render_kernel_forward
    from sdf3d_tpu.utils.profiling import benchmark_fn

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=args.width, height=args.height)
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene}[args.scene]()

    best = None
    for th in (8, 16, 24, 32):
        for tw in (128, 256, 384, 512, 640):
            if th * tw > 32 * 640:
                continue
            # Prefer shapes that divide the image exactly: padding lanes
            # march dead rays AND extra grid programs pay sequencing cost
            # (the round-5 (16,512)→(24,640) 12% finding).
            pc = PallasRenderConfig(tile_h=th, tile_w=tw, interpret=args.interpret)
            try:
                fn = lambda sc: render_kernel_forward(sc, cam, light, mat, cfg, pc)[0]
                sec = benchmark_fn(fn, scene, warmup=1, iters=args.iters)
            except Exception as e:
                print(json.dumps({"tile": [th, tw], "error": f"{type(e).__name__}: {e}"}))
                continue
            rays_s = args.width * args.height / sec
            rec = {"tile": [th, tw], "rays_per_second": rays_s, "seconds": sec}
            print(json.dumps(rec))
            if best is None or rays_s > best["rays_per_second"]:
                best = rec
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
