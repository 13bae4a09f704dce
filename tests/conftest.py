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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of distinct XLA:CPU programs in one
    process; with everything retained, the CPU compiler was observed to
    segfault (deterministically, ~120 programs in) while compiling the
    sharded-elimination program late in the run. Per-module cache clearing
    bounds the live-executable count; cross-module cache reuse is minimal
    anyway (each module compiles its own shapes)."""
    yield
    jax.clear_caches()
