"""Test configuration: force CPU backend with an 8-device virtual mesh so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# driver environment pins JAX_PLATFORMS to the tunneled TPU, and tests must
# never contend for the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: scan-heavy coder kernels dominate test time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
