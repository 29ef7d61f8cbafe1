"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Mirrors the multi-chip dry-run contract: tests exercise real pjit shardings
over a Mesh without TPU hardware.
"""

import os

# NOTE: this environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel). A
# pytest entry-point plugin imports jax before this conftest runs, so jax has
# already captured the env — set the config directly too. Both
# jax_platforms and the legacy jax_platform_name are needed here.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
