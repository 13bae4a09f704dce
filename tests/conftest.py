"""Test configuration: run everything on a virtual 8-device CPU mesh.

The harness environment pins JAX_PLATFORMS=axon (one tunneled TPU chip) and
its sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
interpreter start, so both the env var AND the jax config must be overridden
(before any computation) to run the unit tests on the local CPU devices.
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
    return np.random.default_rng(0)
