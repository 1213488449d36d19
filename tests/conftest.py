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


@pytest.fixture(scope="session")
def segrec_data(tmp_path_factory):
    """SegRec ranking+CTR datasets built from the published sample csv
    (shared by test_segrec and test_tasks)."""
    out = str(tmp_path_factory.mktemp("segrec_data"))
    from segmminterest_tpu.tasks.build_segrec_data import main as build
    build(["--inter_csv", "/root/reference/SegMM_inter_sample.csv",
           "--out", out, "--name", "SegMM", "--min_interactions", "30",
           "--num_warmup", "10", "--n_eval_neg", "9", "--kg_meta", "1"])
    return out
