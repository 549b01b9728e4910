"""Test configuration: force a hermetic 8-device CPU mesh.

Tests must run identically with or without TPU hardware attached; multi-chip
sharding tests use XLA's virtual host devices. These env vars must be set
before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import re

flags = os.environ.get("XLA_FLAGS", "")
# the parallel tests hard-require exactly 8 virtual devices: replace any
# pre-existing count rather than silently inheriting a different one
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start regardless of JAX_PLATFORMS; point it back at CPU before any backend
# is initialized so tests are hermetic and fast.
jax.config.update("jax_platforms", "cpu")

from neat_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# Persistent XLA compile cache: the suite's wall-clock is dominated by CPU
# compilation of the train-step graphs; warm runs drop from ~14 min to ~2.
enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
