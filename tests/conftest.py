"""Test configuration: force CPU backend with an 8-device virtual mesh so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

# The driver environment pins JAX_PLATFORMS to the tunneled TPU and its
# sitecustomize imports jax at interpreter startup, so mutating os.environ
# here is too late — jax.config.update is the only switch that still works.
# Tests must never contend for the single real chip.
# CRA5_TPU_HW_TESTS=1 opts OUT of the CPU forcing so tests/test_tpu_hw.py
# can run against the real chip. In that mode every OTHER collected test
# is skipped (see pytest_collection_modifyitems below) — a full-suite run
# with the flag set would otherwise contend for the single real chip.
_hw = os.environ.get("CRA5_TPU_HW_TESTS") == "1"
if not _hw:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not _hw:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: scan-heavy coder kernels dominate test time.
# XLA-internal AOT caches stay off — this environment remote-compiles with
# CPU features the host lacks, and reloading those AOT blobs risks SIGILL.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")


def pytest_collection_modifyitems(config, items):
    if not _hw:
        return
    skip = pytest.mark.skip(
        reason="CRA5_TPU_HW_TESTS=1: only tests/test_tpu_hw.py runs "
        "against the real chip; CPU tests are skipped in this mode"
    )
    for item in items:
        if item.path.name != "test_tpu_hw.py":
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
