"""Benchmark suite: throughput, scaling efficiency, and roofline context.

Usage:
    python -m benchmarks.suite --quick          # CPU-friendly smoke numbers
    python -m benchmarks.suite                  # full 1080p suite (TPU)
    python -m benchmarks.suite --scaling        # mesh-size sweep

Reports JSONL (one object per measurement) to stdout and optionally a file.
Metrics follow BASELINE.md: rays/s at 1080p sphere-trace fwd and fwd+bwd;
scaling efficiency = rays/s(n) / (n · rays/s(1)).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp


def _setup(width, height):
    import sdf3d_tpu as s

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=width, height=height)
    return s, cfg, s.Camera.reference(), s.reference_light(), s.reference_material()


def bench_forward(width, height, engine, interpret, scene_name="reference", iters=10):
    from sdf3d_tpu.bench import run_benchmark

    return run_benchmark(width, height, engine, interpret, scene_name, mode="fwd", iters=iters)


def bench_fwd_bwd(width, height, engine, interpret, scene_name="reference", iters=10):
    from sdf3d_tpu.bench import run_benchmark

    return run_benchmark(width, height, engine, interpret, scene_name, mode="fwd_bwd", iters=iters)


def bench_scaling(width, height, mesh_sizes=(1, 2, 4, 8), interpret=True, iters=5):
    """Rays/s across mesh sizes (virtual CPU devices when no slice).

    On CPU fakes this validates plumbing, not speed — all virtual devices
    share the same cores, so efficiency is reported but only meaningful on a
    real multi-chip slice.
    """
    import sdf3d_tpu as s
    from sdf3d_tpu.parallel import make_mesh, render_sharded
    from sdf3d_tpu.utils.profiling import benchmark_fn

    _, cfg, cam, light, mat = _setup(width, height)
    scene = s.reference_scene()
    # Follow the actual default placement (jax_default_device may redirect
    # to CPU when the TPU probe failed) rather than default_backend().
    active = next(iter(jnp.zeros(1).devices())).platform
    devices = jax.devices() if active == "tpu" else jax.devices("cpu")
    out = []
    base = None
    for n in mesh_sizes:
        if len(devices) < n or height % n != 0:
            continue
        mesh = make_mesh(devices, n_devices=n)
        fn = lambda sc: render_sharded(sc, cam, light, mat, cfg, mesh)
        sec = benchmark_fn(fn, scene, warmup=1, iters=iters)
        rays_s = width * height / sec
        if base is None:
            base = rays_s
        out.append(
            {
                "metric": "scaling_rays_per_second",
                "n_devices": n,
                "value": rays_s,
                "unit": "rays/s",
                "efficiency": rays_s / (n * base),
            }
        )
    return out


def bench_scene_cost(width=256, height=192, interpret=True, iters=5):
    """Throughput vs scene complexity (random_blobs n sweep)."""
    import sdf3d_tpu as s
    from sdf3d_tpu.utils.profiling import benchmark_fn

    _, cfg, cam, light, mat = _setup(width, height)
    out = []
    for n in (2, 4, 8, 16):
        scene = s.random_blobs(n=n)
        fn = jax.jit(lambda sc: s.render(sc, cam, light, mat, cfg))
        sec = benchmark_fn(fn, scene, warmup=1, iters=iters)
        out.append(
            {
                "metric": "scene_cost_rays_per_second",
                "n_primitives": n + 1,
                "value": width * height / sec,
                "unit": "rays/s",
            }
        )
    return out


def roofline_estimate(width=1920, height=1080):
    """Analytic speed-of-light context for the fused kernel on one v5p chip.

    The kernel is compute-bound: HBM traffic is only the outputs
    (6 f32/pixel), while per-pixel compute is ~206 SDF evals (march 100 +
    normal 6 + shadow 100, voxel_fragment.frag worst case) × ~30 VPU flops
    per 2-primitive eval.  v5p: ~459 TFLOP/s bf16 MXU — irrelevant here —
    VPU f32 is ~4 TFLOP/s-class; HBM ~2.8 TB/s.
    """
    pixels = width * height
    bytes_out = pixels * 6 * 4
    flops_px = 206 * 30
    return {
        "metric": "roofline_estimate",
        "pixels": pixels,
        "hbm_bytes_per_frame": bytes_out,
        "flops_per_pixel_worst_case": flops_px,
        "hbm_bound_frames_per_s_at_2.8TBs": 2.8e12 / bytes_out,
        "note": "worst-case march counts; early exit typically cuts 3-10x",
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes, CPU-friendly")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scene-cost", action="store_true")
    ap.add_argument("--out", default=None, help="also append JSONL here")
    args = ap.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # A hung tunnel blocks XLA calls uninterruptibly — probe first.
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
        from bench import tpu_alive

        if not tpu_alive():
            print("TPU visible but compute probe timed out; using CPU", file=sys.stderr)
            on_tpu = False
    if not on_tpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    w, h = (256, 192) if args.quick or not on_tpu else (1920, 1080)
    engine = "pallas" if on_tpu else "xla"
    results = []
    if args.scaling:
        results += bench_scaling(w, h if h % 8 == 0 else 192)
    elif args.scene_cost:
        results += bench_scene_cost()
    else:
        results.append(bench_forward(w, h, engine, interpret=False, iters=5))
        results.append(bench_fwd_bwd(w, h, engine, interpret=False, iters=5))
        results.append(roofline_estimate(w, h))

    fh = open(args.out, "a") if args.out else None
    for r in results:
        line = json.dumps(r)
        print(line)
        if fh:
            fh.write(line + "\n")
    if fh:
        fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
