"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the TPU analogue of testing
multi-node without a cluster — SURVEY.md §4).

NOTE: this environment's axon sitecustomize forces jax_platforms to
"axon,cpu" regardless of the JAX_PLATFORMS env var, so we must override via
jax.config AFTER import. XLA_FLAGS must still be set before the CPU backend
initializes (it is lazy, so doing it here is early enough)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: the suite's cost is dominated by a few
# big train-step/checkpoint compiles (e.g. the weak-sup train step alone is
# ~2 min cold); warm re-runs hit the cache instead. NOTE this environment
# ships with jax_enable_compilation_cache=False — it must be flipped
# explicitly or the cache dir silently stays empty.
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/bm2f_jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
