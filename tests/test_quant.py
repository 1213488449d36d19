"""int8 feature-table quantization (PARITY D8, opt-in production lever).

The HBM-resident table drops to half the bf16 footprint; because the train
path L1-normalizes every gathered row (core/numerics.l1_normalize, mirroring
main_…SegMM.py:272-273), the per-row scale cancels and the model sees the
int8 rounding error only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.core.numerics import (dequantize_rows, l1_normalize,
                                             quantize_table_int8)


@pytest.fixture()
def rng():
    return np.random.default_rng(11)


def test_quantize_roundtrip_error_bound(rng):
    table = rng.normal(size=(50, 64)).astype(np.float32) * 3.0
    table[7] = 0.0  # all-zero row
    q, scale = quantize_table_int8(table)
    assert q.dtype == np.int8 and scale.shape == (50, 1)
    deq = q.astype(np.float32) * scale
    # symmetric rounding: error <= half a quantization step per element
    step = np.abs(table).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(deq - table) <= step / 2 + 1e-7)
    np.testing.assert_array_equal(deq[7], 0.0)
    # max-abs elements hit the rails exactly
    assert np.abs(q).max() == 127


def test_l1_normalized_rows_match_fp32(rng):
    """After L1 normalization the per-row scale cancels; the normalized
    int8 rows must match the fp32 rows to rounding error (~1/127 of the
    row max, spread over the L1 mass)."""
    table = rng.normal(size=(200, 1024)).astype(np.float32)
    q, scale = quantize_table_int8(table)
    ids = jnp.asarray(rng.integers(0, 200, size=(4, 9)).astype(np.int32))
    deq = dequantize_rows(jnp.asarray(q)[ids.reshape(-1)],
                          jnp.asarray(scale)[ids.reshape(-1)],
                          jnp.float32)
    ours = l1_normalize(deq)
    ref = l1_normalize(jnp.asarray(table)[ids.reshape(-1)])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5)


def test_engine_int8_table_close_to_fp32(rng):
    """One train step with table_quant=int8 vs the fp32 table: identical
    init (params don't depend on the table values' dtype) and a loss within
    quantization noise."""
    import __graft_entry__ as ge
    from segmminterest_tpu.engine.train import InterestEngine
    from segmminterest_tpu.core.mesh import make_mesh

    feat = rng.normal(size=(64, 32)).astype(np.float32)
    batch = ge._tiny_batch(rng, 16, 64)
    losses = {}
    for quant in ("none", "int8"):
        cfg = dataclasses.replace(ge._tiny_config(), table_quant=quant)
        engine = InterestEngine(cfg, n_users=20, n_items=50,
                                feature_table=feat,
                                mesh=make_mesh(jax.devices()[:1]))
        if quant == "int8":
            assert engine._table_quant
            q_tab, q_scale = engine.feat_table
            assert q_tab.dtype == jnp.int8 and q_scale.shape == (64, 1)
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, ld = engine.train_step(state, jax.random.PRNGKey(1), batch)
        losses[quant] = float(ld["loss"])
    assert np.isfinite(losses["int8"])
    np.testing.assert_allclose(losses["int8"], losses["none"], rtol=2e-3)


def test_engine_accepts_prequantized_table(rng):
    """A (int8 rows, float32 scales) pair is used as-is — same compiled
    step and loss as handing the engine the float table to quantize
    (tools/perf_ab.py builds production tables chunk-wise this way)."""
    import __graft_entry__ as ge
    from segmminterest_tpu.engine.train import InterestEngine
    from segmminterest_tpu.core.mesh import make_mesh

    feat = rng.normal(size=(64, 32)).astype(np.float32)
    batch = ge._tiny_batch(rng, 16, 64)
    cfg = dataclasses.replace(ge._tiny_config(), table_quant="int8")
    losses = {}
    for pre in (False, True):
        table = quantize_table_int8(feat) if pre else feat
        engine = InterestEngine(cfg, n_users=20, n_items=50,
                                feature_table=table,
                                mesh=make_mesh(jax.devices()[:1]))
        q_tab, q_scale = engine.feat_table
        assert q_tab.dtype == jnp.int8 and q_scale.shape == (64, 1)
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, ld = engine.train_step(state, jax.random.PRNGKey(1), batch)
        losses[pre] = float(ld["loss"])
    assert losses[True] == losses[False]
    with pytest.raises(ValueError, match="pre-quantized"):
        InterestEngine(cfg, n_users=20, n_items=50,
                       feature_table=(feat, feat[:, :1]),
                       mesh=make_mesh(jax.devices()[:1]))


def test_engine_reuses_device_resident_table(rng):
    """An already-committed table with an equivalent sharding is used AS-IS
    — no device_put copy (engine/train.py:_put). Regression: a redundant put
    of the 4 GB production table while the caller still held the original
    doubled table residency and OOMed the no-remat step (the first r4 B=2048
    sweep was contaminated by exactly this, BASELINE.md)."""
    import dataclasses as dc

    import __graft_entry__ as ge
    from segmminterest_tpu.core.mesh import make_mesh, replicated_sharding
    from segmminterest_tpu.engine.train import InterestEngine

    mesh = make_mesh(jax.devices()[:1])
    sh = replicated_sharding(mesh)
    feat = rng.normal(size=(64, 32)).astype(np.float32)

    # bf16 path: a committed bf16 table must come back by identity
    cfg = dc.replace(ge._tiny_config(), compute_dtype="bfloat16")
    dev = jax.device_put(jnp.asarray(feat, jnp.bfloat16), sh)
    engine = InterestEngine(cfg, n_users=20, n_items=50,
                            feature_table=dev, mesh=mesh)
    assert engine.feat_table is dev

    # pre-quantized committed (rows, scales) pair: both reused by identity
    cfg_q = dc.replace(ge._tiny_config(), table_quant="int8")
    q, scale = quantize_table_int8(feat)
    qd = jax.device_put(jnp.asarray(q), sh)
    sd = jax.device_put(jnp.asarray(scale), sh)
    engine = InterestEngine(cfg_q, n_users=20, n_items=50,
                            feature_table=(qd, sd), mesh=mesh)
    t, s = engine.feat_table
    assert t is qd and s is sd

    # a MIXED pair (device table, host scale) must not pull the committed
    # table back to host: the table comes back by identity, the scale is put
    engine = InterestEngine(cfg_q, n_users=20, n_items=50,
                            feature_table=(qd, np.asarray(scale)), mesh=mesh)
    t, s = engine.feat_table
    assert t is qd
    assert isinstance(s, jax.Array)

    # a host numpy table still goes through device_put (not identity, and
    # cast to the compute dtype)
    engine = InterestEngine(cfg, n_users=20, n_items=50,
                            feature_table=feat, mesh=mesh)
    assert engine.feat_table is not feat
    assert engine.feat_table.dtype == jnp.bfloat16
