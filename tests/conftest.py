"""Test config: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the tunneled-TPU ("axon") backend
and force-sets ``jax_platforms="axon,cpu"`` AFTER reading env vars, so
``JAX_PLATFORMS=cpu`` in the environment is ignored; every jit would go
through the remote-compile relay (~minutes per compile).  The effective
override is a post-import ``jax.config.update`` — XLA_FLAGS must still be
set before the CPU backend is first initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: model-graph compiles are slow; reuse them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Test tiers: whole-model-compile-heavy modules are marked ``slow`` so the
# default iteration loop (`pytest -m "not slow"`) stays under ~5 minutes on
# a 1-core host; CI / pre-round verification runs the full suite.
SLOW_MODULES = {
    "test_trainer",
    "test_spatial",
    "test_gan",
    "test_serving",
    "test_model",
    "test_multihost",
    "test_checkpoint",
    "test_pcn_trainer",
    "test_device_sampler",
    "test_infer_eval",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
