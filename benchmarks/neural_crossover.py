"""Neural-engine crossover sweep (VERDICT r1 item 6): matrix kernel vs
banded XLA across MLP widths and resolutions.

Usage: python -m benchmarks.neural_crossover
Results land in docs/performance.md §Neural-scene engines.
"""

from __future__ import annotations

import dataclasses

import jax

import sdf3d_tpu as s
from sdf3d_tpu import sdf
from sdf3d_tpu.ops.neural_kernel import NeuralRenderConfig, render_neural_forward
from sdf3d_tpu.render import render_banded
from sdf3d_tpu.utils.profiling import benchmark_fn


def main():
    light, mat = s.reference_light(), s.reference_material()
    cam = s.Camera.reference()
    march = dataclasses.replace(
        s.REFERENCE_CONFIG.march, max_steps=64
    )
    shadow = dataclasses.replace(s.REFERENCE_CONFIG.shadow, max_steps=32)

    print(f"{'hidden':>6} {'res':>10} {'kernel ms':>10} {'banded ms':>10}  winner")
    for hidden in (64, 128, 256):
        scene = sdf.union(
            sdf.ground_plane(),
            sdf.neural_sdf(key=0, hidden=hidden, depth=3, radius=0.3),
        )
        for (w, h) in ((1280, 720), (1920, 1080)):
            cfg = dataclasses.replace(
                s.REFERENCE_CONFIG, width=w, height=h, march=march, shadow=shadow
            )
            nc = NeuralRenderConfig()

            fnk = jax.jit(lambda sc: render_neural_forward(sc, cam, light, mat, cfg, nc)[0].mean())
            fnb = jax.jit(lambda sc: render_banded(sc, cam, light, mat, cfg).mean())
            tk = min(benchmark_fn(fnk, scene, warmup=1, iters=3) for _ in range(2))
            tb = min(benchmark_fn(fnb, scene, warmup=1, iters=3) for _ in range(2))
            win = "kernel" if tk < tb else "banded"
            print(f"{hidden:>6} {w}x{h:<6} {tk*1e3:>10.1f} {tb*1e3:>10.1f}  {win}")


if __name__ == "__main__":
    main()
