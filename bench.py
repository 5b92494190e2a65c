#!/usr/bin/env python
"""Driver benchmark: one JSON line — 1080p sphere-trace fwd+bwd rays/s.

Capture strategy (round-3 rework, VERDICT.md item 1): the whole TPU
benchmark — probe *and* workload — runs in a killable subprocess, because a
hung axon tunnel blocks XLA calls uninterruptibly and can only be escaped by
killing the process.  Attempts are retried with backoff across a long window
(default 45 min, env ``SDF3D_BENCH_BUDGET_S``): the round-2 hang outlived a
9-minute probe window but the builder captured a healthy number later the
same session, so the capture must keep trying for as long as the driver
allows.  Only after the budget is exhausted does it fall back to a CPU XLA
measurement, and that fallback is loudly marked ``"fallback": true`` with a
distinct metric name so it can never be mistaken for a TPU regression.
"""

import json
import os
import subprocess
import sys
import time

# One benchmark attempt: probe + workload in a single child process.  The
# child prints exactly one JSON line on success.  run_benchmark itself takes
# ~60-120 s on a healthy chip (compile + robust_min_seconds windows), so a
# 600 s timeout means "the tunnel is hung", not "the chip is slow".
_CHILD = """\
import json, sys
import jax, jax.numpy as jnp
# Cheap compute probe first: on a hung tunnel this blocks forever and the
# parent's timeout kills us; on a healthy one it costs <1 s.
assert float(jnp.sum(jnp.ones((64, 64)))) == 4096.0
if not any(d.platform == "tpu" for d in jax.devices()):
    sys.exit(3)  # distinct code: no TPU visible at all
from sdf3d_tpu.bench import run_benchmark
result = run_benchmark(engine="pallas", mode="fwd_bwd")
print("BENCH_JSON:" + json.dumps(result))
"""


# Secondary metrics (4K fwd/fit, multiview, fast profile, fractal —
# sdf3d_tpu.bench.run_extras) run in their OWN child after the primary
# number is already in hand: a hang or failure there costs nothing.
_EXTRAS_CHILD = """\
import json, sys
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((64, 64)))) == 4096.0
from sdf3d_tpu.bench import run_extras
# Stream a partial line after every entry: if the parent's timeout kills us
# mid-entry, the completed entries survive (the parent keeps the LAST line).
def _emit(partial):
    print("EXTRAS_JSON:" + json.dumps(partial), flush=True)
_emit({})
run_extras(budget_s=float(sys.argv[1]), on_update=_emit)
"""


def try_extras(timeout_s: float) -> dict | None:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _EXTRAS_CHILD, str(max(120.0, timeout_s - 60.0))],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        stdout = proc.stdout or ""
        rc = proc.returncode
    except subprocess.TimeoutExpired as e:
        print(f"extras attempt timed out after {timeout_s:.0f}s; keeping "
              "completed entries", file=sys.stderr)
        raw = e.stdout or b""
        stdout = raw.decode(errors="replace") if isinstance(raw, bytes) else raw
        rc = -1
    last = None
    for line in stdout.splitlines():
        if line.startswith("EXTRAS_JSON:"):
            last = line[len("EXTRAS_JSON:"):]
    if last is not None:
        extras = json.loads(last)
        return extras or None  # the initial empty partial carries nothing
    print(f"extras attempt produced no JSON (rc={rc})", file=sys.stderr)
    return None


def try_tpu_once(timeout_s: float) -> dict | None:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"bench attempt timed out after {timeout_s:.0f}s (hung tunnel?)",
              file=sys.stderr)
        return None
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        print(f"bench attempt failed rc={proc.returncode}: {' | '.join(tail)}",
              file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_JSON:"):
            return json.loads(line[len("BENCH_JSON:"):])
    print("bench attempt produced no JSON line", file=sys.stderr)
    return None


def main() -> int:
    budget_s = float(os.environ.get("SDF3D_BENCH_BUDGET_S", "2700"))
    attempt_timeout_s = float(os.environ.get("SDF3D_BENCH_ATTEMPT_S", "600"))
    deadline = time.monotonic() + budget_s

    backoff = 15.0
    attempt = 0
    result = None
    while time.monotonic() < deadline:
        attempt += 1
        remaining = deadline - time.monotonic()
        print(f"TPU bench attempt {attempt} ({remaining:.0f}s of budget left)",
              file=sys.stderr)
        result = try_tpu_once(min(attempt_timeout_s, max(60.0, remaining)))
        if result is not None:
            result["fallback"] = False
            result["attempts"] = attempt
            # Secondary metrics with whatever budget remains (never at the
            # expense of the primary, which is already captured).
            extras_budget = min(900.0, deadline - time.monotonic() - 30.0)
            if extras_budget > 180.0 and os.environ.get(
                "SDF3D_BENCH_EXTRAS", "1"
            ) != "0":
                extras = try_extras(extras_budget)
                if extras is not None:
                    result["extras"] = extras
            break
        # Hung tunnels recover on the scale of minutes; back off so attempts
        # are spread over the whole budget instead of burning it up front.
        sleep_s = min(backoff, max(0.0, deadline - time.monotonic()))
        if sleep_s > 0:
            time.sleep(sleep_s)
        backoff = min(backoff * 2.0, 300.0)

    if result is None:
        # Budget exhausted: CPU fallback, loudly marked.  Smaller frame so it
        # finishes quickly; the metric name and fallback flag both change.
        print("TPU budget exhausted; falling back to CPU XLA measurement",
              file=sys.stderr)
        import jax

        from sdf3d_tpu.bench import run_benchmark

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        result = run_benchmark(engine="xla", mode="fwd_bwd", width=640, height=360,
                               iters=3, frames_per_dispatch=2)
        result["fallback"] = True
        result["attempts"] = attempt

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
