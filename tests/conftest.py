"""Test harness configuration.

Runs everything on CPU with 8 virtual devices (the standard JAX recipe for
testing `shard_map`/mesh logic without a TPU slice — SURVEY.md §4), pinned via
`jax_default_device` because the axon TPU plugin registers itself regardless
of `JAX_PLATFORMS`.  Tests marked `tpu` opt back into the real device.
"""

import os

# Must be set before jax initializes its backends.
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture
def cpu_mesh8(cpu_devices):
    import numpy as np

    return jax.sharding.Mesh(np.array(cpu_devices).reshape(4, 2), ("x", "y"))
