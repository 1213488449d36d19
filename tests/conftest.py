"""Test configuration: force an 8-device virtual CPU platform so pjit/mesh
sharding is exercised without TPU hardware (SURVEY.md §4: JAX's fake-backend
mechanism)."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already in the environment, so the env-var route is too
# late here; the config update still works because no backend is live yet.
jax.config.update("jax_platforms", "cpu")

# parity tests compare against fp64 oracles (SURVEY.md §4); production code
# passes explicit fp32/bf16 dtypes and is unaffected by this flag
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
