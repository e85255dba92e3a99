"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the TPU analogue of testing
multi-node without a cluster — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
