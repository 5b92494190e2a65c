"""Utilities: profiling, structured logging, image IO, colormaps."""

from sdf3d_tpu.utils.logging import MetricsLogger
from sdf3d_tpu.utils.profiling import (
    Timer,
    benchmark_fn,
    benchmark_fn_latency,
    force_completion,
    rays_per_second,
)
from sdf3d_tpu.utils.image_io import write_png, write_ppm, to_uint8

__all__ = [
    "MetricsLogger",
    "Timer",
    "benchmark_fn",
    "benchmark_fn_latency",
    "force_completion",
    "rays_per_second",
    "write_png",
    "write_ppm",
    "to_uint8",
]
