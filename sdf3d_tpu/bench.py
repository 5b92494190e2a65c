"""Benchmark harness: rays/s for forward and forward+backward renders.

The reference publishes no numbers (BASELINE.md); the targets are the north
star's: ≥1e9 rays/s per chip at 1080p sphere-trace fwd+bwd.  ``vs_baseline``
reports the measured value against that 1e9 target.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def run_benchmark(
    width: int = 1920,
    height: int = 1080,
    engine: str = "pallas",
    interpret: bool = False,
    scene_name: str = "reference",
    mode: str = "fwd_bwd",
    iters: int = 10,
) -> dict:
    """Time the renderer; returns the one-line JSON payload (BASELINE metric:
    rays/s at 1080p sphere-trace fwd+bwd, target 1e9/chip)."""
    import sdf3d_tpu as s
    from sdf3d_tpu.utils.profiling import benchmark_fn

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=width, height=height)
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene, "sphere": s.sphere_scene}[scene_name]()

    if engine == "pallas":
        from sdf3d_tpu.ops import PallasRenderConfig, render_pallas

        pc = PallasRenderConfig(interpret=interpret)

        if mode == "fwd":
            fn = jax.jit(lambda sc: render_pallas(cfg, pc, sc, cam, light, mat))
        else:
            fn = jax.jit(jax.grad(lambda sc: jnp.sum(render_pallas(cfg, pc, sc, cam, light, mat)) , allow_int=False))
    else:
        if mode == "fwd":
            fn = jax.jit(lambda sc: s.render(sc, cam, light, mat, cfg))
        else:
            fn = jax.jit(jax.grad(lambda sc: jnp.sum(s.render_diff(sc, cam, light, mat, cfg))))

    # Best-of-3 amortized runs: the shared/tunnelled TPU shows transient
    # slow windows (2x swings between identical runs); the minimum is the
    # honest sustained-throughput estimate of the kernel itself.
    seconds = min(benchmark_fn(fn, scene, warmup=2 if r == 0 else 1, iters=iters) for r in range(3))
    rays_s = width * height / seconds
    # Report the device compute actually ran on (jax_default_device may
    # redirect away from default_backend()).
    device = next(iter(jnp.zeros(1).devices()))
    return {
        "metric": f"rays_per_second_{height}p_{mode}_{engine}",
        "value": rays_s,
        "unit": "rays/s",
        "vs_baseline": rays_s / 1e9,
        "seconds_per_frame": seconds,
        "backend": device.platform,
    }
