"""Scaling-efficiency projection from measured per-ray march work.

The BASELINE row "≥90% rays/s scaling efficiency at 1/8/32 chips" cannot be
*measured* here (1 real chip; CPU fakes share host cores), but its dominant
term can: with zero forward communication and one psum per fit step, scaling
efficiency is load balance — ``total_work / (n · max_device_work)``.  This
tool measures the actual per-ray march step counts (primary + shadow, the
compute-dominant loops) on real scenes and projects that ratio for both row
layouts:

- **contiguous** row slabs: device d gets rows [d·H/n, (d+1)·H/n) — sky
  slabs finish in a handful of steps while object slabs march deep;
- **interleaved** tile_h-row blocks strided by n (the
  ``shard_interleaved``/``interleaved=True`` layout): every device sees a
  representative sky/ground/object mix.

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
    """Per-ray primary march step count (+ shadow steps when configured) —
    the exact masked-loop semantics of march.sphere_trace, with a counter."""
    import jax.numpy as jnp
    from jax import lax

    batch = origins.shape[:-1]

    def body(_, carry):
        dist, steps, active = carry
        p = origins + dist[..., None] * directions
        sv = scene.distance(p)
        steps = steps + active
        dist_new = jnp.where(active > 0, dist + sv, dist)
        done = (dist_new > mc.max_distance) | (sv < mc.epsilon)
        return dist_new, steps, active * (1.0 - done.astype(jnp.float32))

    dist0 = jnp.zeros(batch, jnp.float32)
    steps0 = jnp.zeros(batch, jnp.float32)
    active0 = jnp.ones(batch, jnp.float32)
    dist, steps, _ = lax.fori_loop(0, mc.max_steps, body, (dist0, steps0, active0))

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
        tile_hs = (args.tile_h,) if args.tile_h else (16, 8)
        for n in (2, 4, 8, 16, 32):
            for interleaved in (False, True):
                # Interleaved projection truncates to the largest
                # n*tile_h-divisible row prefix (projection-only; production
                # interleaved runs require exact divisibility).
                for th in tile_hs if interleaved else tile_hs[:1]:
                    eff = project(work_rows, n, th, interleaved)
                    lines.append({
                        "metric": "projected_scaling_efficiency",
                        "scene": scene_name,
                        "resolution": f"{args.width}x{args.height}",
                        "n_devices": n,
                        "layout": "interleaved" if interleaved else "contiguous",
                        "tile_h": th if interleaved else 0,
                        "value": round(eff, 4),
                        "basis": "march+shadow step counts; eff = total_work/(n*max_device_work)",
                    })
    out = pathlib.Path(args.out)
    with out.open("w") as f:
        for line in lines:
            print(json.dumps(line))
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
