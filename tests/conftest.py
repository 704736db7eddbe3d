"""Test harness: force an 8-virtual-device CPU platform before jax imports.

SURVEY.md §4(d): mesh/sharding paths are tested on CPU with
``xla_force_host_platform_device_count=8`` so no TPU is needed; numerics
tests compare against the torch-CPU oracle.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
