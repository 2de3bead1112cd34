import os

# Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
# paths are exercised without TPU hardware. The axon sitecustomize force-sets
# jax_platforms to "axon,cpu" at interpreter start, so overriding the env var
# is not enough — we must update the jax config after import (before any
# backend is touched).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
