"""Test environment: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (the driver separately dry-runs multi-chip compilation)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the TPU tunnel), so the env var above is too late —
# update the live config before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
