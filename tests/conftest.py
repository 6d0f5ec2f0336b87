"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware
(XLA host-platform device partitioning); the real-chip path is exercised by
bench.py and the driver's graft entry checks.
"""
import os

# Must be set before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not honored when an out-of-tree TPU plugin (axon) is
# installed; the config update is.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
