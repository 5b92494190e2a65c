#!/usr/bin/env python
"""Driver benchmark: one JSON line — 1080p sphere-trace fwd+bwd rays/s.

Runs the fused Pallas path on the real TPU when one is present; falls back
to the XLA path (any backend) so the line is always produced.
"""

import json
import sys


def main() -> int:
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    from sdf3d_tpu.bench import run_benchmark

    try:
        if on_tpu:
            result = run_benchmark(engine="pallas", mode="fwd_bwd")
        else:
            raise RuntimeError("no TPU visible")
    except Exception as e:  # Pallas/TPU unavailable: keep the metric flowing.
        print(f"pallas/tpu path unavailable ({type(e).__name__}: {e}); "
              "falling back to XLA path", file=sys.stderr)
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        result = run_benchmark(engine="xla", mode="fwd_bwd", width=640, height=360, iters=3)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
