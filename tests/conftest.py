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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
