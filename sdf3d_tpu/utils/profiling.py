"""Profiling: wall-clock benchmarking and the rays/s meter.

The reference's entire instrumentation is a µs tic/toc pair per frame
(``/root/reference/Code/src/main.cpp:89,97``).  TPU-native replacements
(SURVEY.md §5): a ``block_until_ready`` wall-clock harness (compile excluded
via warmup), the rays/s metric itself, and a thin ``jax.profiler`` trace hook
for Perfetto/XProf capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    """Context-manager wall timer: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


def benchmark_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Median wall-clock seconds per call of ``fn`` (device-synchronized).

    ``warmup`` calls absorb jit compilation and autotuning; each timed call
    blocks on the result so async dispatch can't hide device time.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
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
