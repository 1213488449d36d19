"""Throughput benchmark: flagship SegMM config, train-step interactions/sec.

Prints ONE JSON line:
  {"metric": "interactions_per_sec", "value": N, "unit": "interactions/s",
   "vs_baseline": N}

Workload = the reference's published full-size configuration
(main_for_seq_leave_earlystop_SegMM.py defaults): dual-backbone 'both' mode,
d_model=512, 6 encoder layers, 16 heads, batch 1024, 40 video segments x
1024-d CLIP features + 100 user segments, interestBPR+focal losses, AdamW +
grad clip — measured end to end including device-side feature-table gathers
(the host ships int32 indices, as in production).

vs_baseline: the reference publishes no throughput (BASELINE.md). The divisor
here is an *estimate* of the reference's A100 interactions/sec
(REFERENCE_A100_IPS_EST below): the reference's per-sample host work (pandas
row parsing + ~140 python dict lookups + 140 single-row memmap reads per
sample, dataloader_SegMM.py:271-362) bounds it well below compute; 2,000
interactions/s is a generous estimate for that pipeline. Replace with a
measured value when the reference can be run on an A100.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_A100_IPS_EST = 2000.0

BATCH = 1024
N_LINES = 200_000   # synthetic feature-table rows (real table: ~3.9M)
FEAT_DIM = 1024
USER_MAX = 100
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def make_batch(rng, B):
    labels = np.full((B, 40), -2, np.int32)
    durs = rng.integers(4, 41, size=B)
    for i in range(B):
        dur = durs[i]
        leave = rng.integers(0, dur)
        labels[i, :leave] = 1
        labels[i, leave] = 0
        labels[i, leave + 1:dur] = -1
    return {
        "label": labels,
        "user_identity_id": rng.integers(1, 1903, size=B).astype(np.int32),
        "photo_identity_id": rng.integers(1, 352494, size=B).astype(np.int32),
        "vid_mask": labels != -2,
        "user_mask": np.ones((B, USER_MAX), bool),
        "row_mask": np.ones(B, bool),
        "photo_lines": rng.integers(0, N_LINES, size=(B, 40)).astype(np.int32),
        "user_lines": rng.integers(0, N_LINES,
                                   size=(B, USER_MAX)).astype(np.int32),
    }


def main():
    import jax
    from segmminterest_tpu.engine.train import InterestEngine
    from segmminterest_tpu.utils.config import InterestConfig

    cfg = InterestConfig(
        d_model=512, nhead=16, num_layers_enc=6,
        user_input_type="both", photo_input_type="both", fusion_heads=2,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        train_batch_size=BATCH, compute_dtype="bfloat16")

    rng = np.random.default_rng(0)
    feat_table = rng.normal(size=(N_LINES, FEAT_DIM)).astype(np.float32)
    engine = InterestEngine(cfg, n_users=1903, n_items=352494,
                            feature_table=feat_table)

    batches = [make_batch(rng, BATCH) for _ in range(4)]
    state = engine.init_state(jax.random.PRNGKey(0), batches[0])

    key = jax.random.key(1, impl=cfg.rng_impl)
    for i in range(WARMUP_STEPS):
        key, k = jax.random.split(key)
        state, loss_dict = engine.train_step(state, k, batches[i % 4])
    jax.block_until_ready(loss_dict["loss"])

    st = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, k = jax.random.split(key)
        state, loss_dict = engine.train_step(state, k, batches[i % 4])
    jax.block_until_ready(loss_dict["loss"])
    elapsed = time.perf_counter() - st

    ips = BATCH * MEASURE_STEPS / elapsed
    print(json.dumps({
        "metric": "interactions_per_sec",
        "value": round(ips, 1),
        "unit": "interactions/s",
        "vs_baseline": round(ips / REFERENCE_A100_IPS_EST, 3),
    }))


if __name__ == "__main__":
    main()
