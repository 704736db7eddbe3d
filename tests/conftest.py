"""Test harness: force a genuine 8-virtual-device CPU platform.

SURVEY.md §4(d): mesh/sharding paths are tested on CPU with 8 virtual host
devices; numerics tests compare against the torch-CPU oracle, which is only
meaningful with both sides on host float32.

Subtlety: this machine's ``sitecustomize`` (PALLAS_AXON_POOL_IPS set)
registers the tunneled-TPU "axon" PJRT plugin and imports jax at
interpreter startup — *before* pytest loads this conftest — and pins the
default backend to the TPU regardless of JAX_PLATFORMS set here (the env
was already read at import). So we reconfigure jax *in-process*:
``jax_platforms=cpu`` + ``jax_num_cpu_devices=8`` + ``clear_backends()``
(safe — no arrays exist yet at conftest-import time). Set
OSVOS_TEST_PLATFORM=axon to deliberately run the suite against the real
TPU chip instead.
"""

import os

_WANT = os.environ.get("OSVOS_TEST_PLATFORM", "cpu")

if _WANT == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
    import jax

    if jax.config.jax_platforms != "cpu" or jax.config.jax_num_cpu_devices < 8:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        from jax.extend.backend import clear_backends

        clear_backends()
else:
    os.environ["JAX_PLATFORMS"] = _WANT

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
