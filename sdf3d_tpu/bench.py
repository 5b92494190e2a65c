"""Benchmark harness: rays/s for forward and forward+backward renders.

The reference publishes no numbers (BASELINE.md); the targets are the north
star's: ≥1e9 rays/s per chip at 1080p sphere-trace fwd+bwd.  ``vs_baseline``
reports the measured value against that 1e9 target.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


def robust_min_seconds(
    fn,
    *args,
    iters: int = 10,
    min_windows: int = 8,
    max_windows: int = 30,
    agree_tol: float = 0.05,
    min_span_s: float = 4.0,
) -> float:
    """Tenancy-robust amortized seconds/call: the min over many windows.

    The shared/tunnelled chip shows transient 2x slow *periods* lasting
    seconds, so a handful of back-to-back windows can all land in one slow
    period and halve the recorded number (round-1 driver capture: 8.27 ms
    where the kernel measures 4.4 ms).  Defense: sample ``min_windows``
    amortized windows spread over at least ``min_span_s`` of wall time, then
    keep sampling (up to ``max_windows``) until the two best windows agree
    within ``agree_tol`` — a minimum corroborated by a second independent
    window is a sustained-throughput measurement, not a fluke.
    """
    from sdf3d_tpu.utils.profiling import benchmark_fn

    times: list[float] = []
    t0 = time.perf_counter()
    # First window carries the jit/compile warmup.
    times.append(benchmark_fn(fn, *args, warmup=2, iters=iters))
    while True:
        enough = (
            len(times) >= min_windows
            and (time.perf_counter() - t0) >= min_span_s
        )
        if enough:
            best = sorted(times)
            if best[1] <= best[0] * (1.0 + agree_tol):
                break
        if len(times) >= max_windows:
            break
        times.append(benchmark_fn(fn, *args, warmup=0, iters=iters))
        # Spread windows out a little so consecutive windows are not all
        # inside the same slow period.
        time.sleep(0.05)
    return min(times)


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

    # Min over many spread-out amortized windows with two-window agreement:
    # the honest sustained-throughput estimate on a chip with transient
    # multi-second slow periods (see robust_min_seconds).
    seconds = robust_min_seconds(fn, scene, iters=iters)
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
