"""Scaling-efficiency projection from measured per-ray march work.

The BASELINE row "≥90% rays/s scaling efficiency at 1/8/32 chips" cannot be
*measured* here (1 real chip; CPU fakes share host cores), but its dominant
term can: with zero forward communication and one all-reduce per fit step,
scaling efficiency is load balance × a small communication factor.  This
tool measures the actual per-ray march step counts (primary + shadow, the
compute-dominant loops) on real scenes and projects
``total_work / (n · max_device_work)`` for every shipped layout:

- **contiguous** row slabs: device d gets rows [d·H/n, (d+1)·H/n) — sky
  slabs finish in a handful of steps while object slabs march deep;
- **interleaved** tile_h-row blocks strided by n (the
  ``shard_interleaved``/``interleaved=True`` layout): every device sees a
  representative sky/ground/object mix;
- **tiles_rr**: the 2-D tile queue (parallel/tile_queue.py) with the
  scene-independent round-robin policy — tiles spread over rows AND
  columns, and non-n-divisible images pad with dummy tiles instead of
  losing balance;
- **tiles_balanced**: the tile queue planned by greedy LPT on the
  1/8-resolution march pre-pass (``estimate_tile_work`` — exactly what
  production runs), *evaluated against the exact work* — so the number
  includes estimator error, not just assignment quality.

Each record also carries the gradient all-reduce communication model:
``eff_with_comm = eff · t_step/(t_step + t_comm)`` with t_comm from the
ring-collective message count ((n−1) hops/stream, assumed 1 µs/hop ICI
latency — conservative) plus wire bytes at 45 GB/s/link, against the
measured 1.89 ms 1080p fit step.  For the analytic scenes' ~150-byte
gradients the term is pure latency (≤2% at n=32); the bandwidth term only
matters for neural-scene MLP gradients (see collectives_lab).

Writes one JSON line per (scene, layout, n) to stdout and REWRITES
SCALING.jsonl at the repo root whole (idempotent — re-running never
duplicates rows; git history preserves prior rounds).  Run:
``python -m benchmarks.scaling_report [--width 1920 --height 1080]``
(any backend — step counts are backend-independent integers).
"""

from __future__ import annotations

import argparse
import json
import pathlib


def march_step_counts(scene, origins, directions, mc, shadow_cfg=None, light=None):
    """Per-ray primary march step count (+ shadow steps when configured).
    The primary counter is the library's single source of truth
    (``march.march_step_map`` — also drives the tile-queue balanced
    planner); this adds the shadow-work term."""
    import jax.numpy as jnp
    from jax import lax

    from sdf3d_tpu.march import march_step_map

    batch = origins.shape[:-1]
    dist, steps = march_step_map(scene.distance, origins, directions, mc)

    if shadow_cfg is not None and shadow_cfg.enabled:
        # Shadow work exists only for lit surface hits; approximate the lane
        # gate with the hit mask (ndoti>0 refines it, but hit/miss dominates).
        hit = dist <= mc.max_distance
        p = origins + dist[..., None] * directions
        ldir = light.position - p
        ldir = ldir / jnp.maximum(
            jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-9
        )
        so = p + 2.0 * mc.epsilon * ldir  # origin offset along light dir ≈ normal·2ε scale

        def sbody(_, carry):
            d_, steps_, active_ = carry
            sv = scene.distance(so + d_[..., None] * ldir)
            steps_ = steps_ + active_
            d_new = jnp.where(active_ > 0, d_ + sv, d_)
            done = (d_new > mc.max_distance) | (sv < mc.epsilon)
            return d_new, steps_, active_ * (1.0 - done.astype(jnp.float32))

        sd0 = jnp.zeros(batch, jnp.float32)
        ss0 = jnp.zeros(batch, jnp.float32)
        sa0 = hit.astype(jnp.float32)
        _, ssteps, _ = lax.fori_loop(0, shadow_cfg.max_steps, sbody, (sd0, ss0, sa0))
        steps = steps + ssteps
    return steps


def project(work_rows, n, tile_h, interleaved):
    """Projected efficiency total/(n·max) for a row-layout of per-row work."""
    import numpy as np

    H = work_rows.shape[0]
    if interleaved:
        blocks = H // (n * tile_h)
        v = work_rows[: blocks * n * tile_h].reshape(blocks, n, tile_h)
        per_dev = v.sum(axis=(0, 2))
    else:
        slab = H // n
        per_dev = work_rows[: slab * n].reshape(n, slab).sum(axis=1)
    return float(per_dev.sum() / (n * per_dev.max()))


def project_tiles(exact_tile_work, n, plan):
    """Projected efficiency of a TilePlan evaluated on the EXACT per-tile
    work (the plan itself may have been built from an estimate)."""
    import numpy as np

    th, tw = plan.tile_h, plan.tile_w
    loads = np.zeros(n)
    for d in range(n):
        for t in range(plan.tiles_per_device):
            r, c = float(plan.rows[d, t]), float(plan.cols[d, t])
            if r >= plan.height:
                continue  # dummy tile
            loads[d] += exact_tile_work[int(r) // th, int(c) // tw]
    return float(loads.sum() / (n * loads.max()))


def comm_factor(n, grad_bytes, step_seconds=1.89e-3,
                hop_latency_s=1e-6, link_bw=45e9):
    """t_step/(t_step+t_comm) for the per-step gradient ring all-reduce.

    Ring model (parallel/collectives.py): n−1 hops per stream, each a
    message of grad_bytes/2 — latency (n−1)·hop_latency (streams overlap),
    wire (n−1)/2·grad_bytes/link_bw.  Conservative: assumes zero
    compute/comm overlap (the kernels are built to overlap)."""
    if n == 1:
        return 1.0
    t_comm = (n - 1) * hop_latency_s + (n - 1) * grad_bytes / 2 / link_bw
    return step_seconds / (step_seconds + t_comm)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile-h", type=int, default=0,
                    help="interleave block height; 0 = report both 16 (the "
                    "1080p kernel default) and 8 (finer mixing for n=32)")
    ap.add_argument("--out", default=str(pathlib.Path(__file__).resolve().parents[1] / "SCALING.jsonl"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np

    import sdf3d_tpu as s
    from sdf3d_tpu.camera import camera_rays

    import dataclasses

    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=args.width, height=args.height)
    cam, light = s.Camera.reference(), s.reference_light()
    o, d = camera_rays(cam, cfg.width, cfg.height, cfg.ray_mode)

    from sdf3d_tpu.ops.scene_program import scene_param_vector
    from sdf3d_tpu.parallel.tile_queue import (
        estimate_tile_work,
        plan_tiles,
        pool_work_to_tiles,
    )

    TH, TW = 8, 128  # tile-queue planning tile (the kernel minimum)
    lines = []
    for scene_name, scene in (
        ("reference", s.reference_scene()),
        ("flagship", s.flagship_scene()),
        ("fractal", s.fractal_scene()),
    ):
        steps = np.asarray(
            march_step_counts(scene, o, d, cfg.march, cfg.shadow, light)
        )
        work_rows = steps.sum(axis=1)
        exact_tiles = pool_work_to_tiles(
            steps.astype(np.float64), args.height, args.width, TH, TW
        )
        # The production balanced plan uses the cheap 1/8-scale estimate;
        # projecting with it (against exact work) bakes estimator error in.
        est = estimate_tile_work(scene, cam, cfg, light, scale=8)
        est_tiles = pool_work_to_tiles(est, args.height, args.width, TH, TW)
        grad_bytes = 4 * (int(scene_param_vector(scene).shape[0]) + 31)
        tile_hs = (args.tile_h,) if args.tile_h else (16, 8)
        for n in (2, 4, 8, 16, 32):
            cf = comm_factor(n, grad_bytes)

            def emit(layout, th, eff):
                lines.append({
                    "metric": "projected_scaling_efficiency",
                    "scene": scene_name,
                    "resolution": f"{args.width}x{args.height}",
                    "n_devices": n,
                    "layout": layout,
                    "tile_h": th,
                    "value": round(eff, 4),
                    "comm_factor": round(cf, 4),
                    "value_with_comm": round(eff * cf, 4),
                    "basis": "march+shadow step counts; eff = total_work/"
                             "(n*max_device_work); comm = (n-1)-hop ring "
                             "model at 1us/hop, 45GB/s/link vs 1.89ms step",
                })

            for interleaved in (False, True):
                # Interleaved projection truncates to the largest
                # n*tile_h-divisible row prefix (projection-only; production
                # interleaved runs require exact divisibility).
                for th in tile_hs if interleaved else tile_hs[:1]:
                    eff = project(work_rows, n, th, interleaved)
                    emit("interleaved" if interleaved else "contiguous",
                         th if interleaved else 0, eff)
            emit("tiles_rr", TH, project_tiles(
                exact_tiles, n,
                plan_tiles(args.height, args.width, TH, TW, n, "round_robin"),
            ))
            emit("tiles_balanced", TH, project_tiles(
                exact_tiles, n,
                plan_tiles(args.height, args.width, TH, TW, n, "balanced",
                           est_tiles),
            ))
    out = pathlib.Path(args.out)
    with out.open("w") as f:
        for line in lines:
            print(json.dumps(line))
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
