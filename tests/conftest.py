"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising multi-device sharding without a
real TPU slice (SURVEY.md §4): env vars must be set before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize pins jax_platforms to the TPU tunnel; tests must run
# on the virtual 8-device CPU mesh (fast, deterministic, exercises sharding).
# SD_TPU_RUN_TPU_TESTS keeps the real device for tests/test_tpu_only.py.
if not os.environ.get("SD_TPU_RUN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
