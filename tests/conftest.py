"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This is the TPU-native answer to "test multi-device without a pod" (SURVEY.md
section 4): all tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
so sharding/pjit paths compile and execute with real collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# This image pins jax_platforms to "axon,cpu" (the TPU tunnel) somewhere inside
# jax's import, ignoring the env var — override through the config API, which is
# authoritative, and fan out 8 virtual CPU devices for sharding tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
