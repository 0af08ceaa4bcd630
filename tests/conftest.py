"""Test config: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (the TPU bench path is driven by bench.py).

The container's sitecustomize registers a tunneled TPU PJRT plugin and the
environment pins JAX_PLATFORMS to it; running eager test ops through that
tunnel is a network roundtrip per op.  Backend init is lazy, so flipping the
platform here (before any jax op runs) is sufficient.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
