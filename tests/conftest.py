"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This is the TPU-native answer to "test multi-device without a pod" (SURVEY.md
section 4): all tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
so sharding/pjit paths compile and execute with real collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
