"""Fast-profile lab: throughput + image delta of the declared non-parity
fast profile (``config.fast_config`` — see its docstring for the measured
contents) against the parity profile, on the live chip.

Two measurements per scene, both at 1080p:

1. **Image delta**: one parity render and one fast render of the same
   frame; PSNR and max abs error over the clamped image.  Quantifies what
   the fast profile gives up — the table lands in docs/performance.md.
2. **Throughput**: slope-measured fwd and fwd+bwd rays/s for each profile
   via ``sdf3d_tpu.bench.run_benchmark`` (same harness as the driver
   metric, so the numbers are directly comparable to the headline row).

Usage: python -m benchmarks.fast_profile [--quick]
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np

import sdf3d_tpu as s
from sdf3d_tpu.bench import run_benchmark


def image_delta(scene_name: str, width: int = 1920, height: int = 1080) -> dict:
    cfg = dataclasses.replace(s.REFERENCE_CONFIG, width=width, height=height)
    fast = s.fast_config(cfg)
    cam, light, mat = s.Camera.reference(), s.reference_light(), s.reference_material()
    scene = {"reference": s.reference_scene, "flagship": s.flagship_scene}[scene_name]()
    a = np.clip(np.asarray(s.render(scene, cam, light, mat, cfg)), 0.0, 1.0)
    b = np.clip(np.asarray(s.render(scene, cam, light, mat, fast)), 0.0, 1.0)
    mse = float(np.mean((a - b) ** 2))
    return {
        "scene": scene_name,
        "psnr_db": 10.0 * np.log10(1.0 / max(mse, 1e-12)),
        "max_abs_err": float(np.max(np.abs(a - b))),
        "pixels_changed_gt_1pct": float(np.mean(np.any(np.abs(a - b) > 0.01, axis=-1))),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    out: dict = {"deltas": [], "throughput": []}

    for scene_name in ("reference", "flagship"):
        d = image_delta(scene_name)
        out["deltas"].append(d)
        print(json.dumps(d))

    for profile in ("parity", "fast"):
        for mode in ("fwd", "fwd_bwd"):
            r = run_benchmark(
                mode=mode,
                profile=profile,
                iters=4 if quick else 10,
                frames_per_dispatch=8 if quick else 16,
            )
            row = {
                "profile": profile,
                "mode": mode,
                "rays_per_s": r["value"],
                "ms_per_frame": 1e3 * r["seconds_per_frame"],
                "backend": r["backend"],
            }
            out["throughput"].append(row)
            print(json.dumps(row))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
