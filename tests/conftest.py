"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS, so pin the platform via jax.config as well
import jax

jax.config.update("jax_platforms", "cpu")

# opt-in persistent compile cache for local iteration: cuts repeat suite
# time sharply (the suite is compile-bound on this 1-core host) but emits
# noisy machine-feature warnings, so it is off by default
if os.environ.get("TOPAZ_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
