"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os

# force-override: the environment pins JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: model-graph compiles on CPU are slow; reuse them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
