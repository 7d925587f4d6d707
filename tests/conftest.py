"""Test configuration: force an 8-device virtual CPU platform, so
mesh/shard_map data-parallel paths are exercised without TPUs
(SURVEY.md §4 strategy (d)).

The environment's ``sitecustomize`` imports jax and registers the axon TPU
backend in every interpreter, so env vars alone are too late — but backends
initialise lazily, so flipping ``jax_platforms`` at conftest import (before
any test touches a device) reliably lands the whole suite on CPU.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
