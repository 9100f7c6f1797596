"""Test harness configuration.

Force the JAX CPU backend with 8 virtual devices BEFORE jax initializes, so
multi-chip sharding (DP/TP/SP meshes) is exercised on any host — something the
reference's test scripts (all requiring real GPUs, /root/reference/tests/)
never provided.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
