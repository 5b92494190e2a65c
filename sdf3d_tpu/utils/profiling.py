"""Profiling: wall-clock benchmarking and the rays/s meter.

The reference's entire instrumentation is a µs tic/toc pair per frame
(``/root/reference/Code/src/main.cpp:89,97``).  TPU-native replacements
(SURVEY.md §5): a wall-clock harness with a *true* device-sync barrier
(compile excluded via warmup), the rays/s metric itself, and a thin
``jax.profiler`` trace hook for Perfetto/XProf capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class Timer:
    """Context-manager wall timer: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


_take1 = jax.jit(lambda a: a.reshape(-1)[:1])


def force_completion(out) -> None:
    """Unambiguous completion barrier for ``out`` (any pytree of arrays).

    ``jax.block_until_ready`` is *not* a reliable barrier on relay/tunnelled
    backends (observed: it returns while frames are still in flight, making
    naive timings measure dispatch, not compute).  Copying one element of one
    leaf to host cannot complete before every op feeding that leaf has run on
    the serial device queue, so it is a true sync point at ~one RTT cost.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(_take1(leaf))


def benchmark_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Amortized wall-clock seconds per call of ``fn`` (device-synchronized).

    ``warmup`` calls absorb jit compilation and autotuning (including the
    tiny sync executable).  The timed section enqueues ``iters`` calls
    back-to-back and forces completion of the *last* result: the device
    executes the queue serially, so elapsed/iters is steady-state per-call
    time with the host→device round-trip amortized away — the honest
    throughput number on backends where per-dispatch sync costs ~10s of ms.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is not None:
        force_completion(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force_completion(out)
    return (time.perf_counter() - t0) / iters


def benchmark_fn_latency(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Median per-call latency including one full host sync per call.

    Use for interactive-frame-time questions; use :func:`benchmark_fn` for
    throughput (rays/s) questions.
    """
    for _ in range(warmup):
        force_completion(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_completion(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def rays_per_second(width: int, height: int, seconds_per_frame: float, frames: int = 1) -> float:
    """Primary rays per second — the benchmark metric (BASELINE.md)."""
    return width * height * frames / max(seconds_per_frame, 1e-12)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace (view in XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
