"""Test harness configuration.

Force the JAX CPU backend with 8 virtual devices BEFORE jax initializes, so
multi-chip sharding (DP/TP/SP meshes) is exercised on any host — something the
reference's test scripts (all requiring real GPUs, /root/reference/tests/)
never provided.
"""

import os

# Force (not setdefault): the ambient environment pins JAX_PLATFORMS=axon
# (single real TPU via tunnel) — tests must never grab it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize (axon TPU relay) imports jax at interpreter start, so jax has
# already captured JAX_PLATFORMS=axon from the ambient env — the env-var write
# above is too late for the config default. Override via jax.config before any
# backend initializes. XLA_FLAGS is read lazily at backend init, so the env
# write above still takes effect for the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Sub-minute development subset (`pytest -m smoke`): modules with no
# 8-device-mesh or full-pipeline compiles (those dominate the ~16 min
# full-suite wall time).  Measured: samplers 6s + layers 10s + scheduler 3s.
_SMOKE_MODULES = {
    "tests.test_samplers", "tests.test_scheduler", "tests.test_layers",
    "test_samplers", "test_scheduler", "test_layers",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
