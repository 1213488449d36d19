"""Instrument the end-to-end pipeline to localize the e2e-vs-device-path gap
(VERDICT r2 #3: 12.6% unexplained).

Replicates bench.py's e2e loop (SeqReader sample data -> BatchIterator
threaded prefetch -> put_batch -> train step) but times each phase per step:

  iter_wait   blocking time in next(batch) (prefetch failed to hide assembly)
  put         jax.device_put dispatch of the batch (tunnel h2d latency)
  dispatch    train-step dispatch (traced call until the async handle returns)
  epoch_gap   time between the last step of epoch N and the first of N+1

Totals are compared against the pure device-path steady state measured in the
same process, and the padded-slot fraction of the sample data is reported
(the final partial batch pads to B=1024 — those slots do device work that
the e2e ips metric, which counts real rows, cannot credit).

  python tools/e2e_probe.py [--epochs 2] [--batch 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--out", default="/tmp/e2e_probe.json")
    args = p.parse_args()

    import jax

    from bench import BATCH, SAMPLE_CSV, make_batch, synthetic_store
    from segmminterest_tpu.data.dataset import BatchIterator
    from segmminterest_tpu.data.reader import SeqReader
    from segmminterest_tpu.engine.train import InterestEngine
    from segmminterest_tpu.utils.config import InterestConfig

    B = args.batch
    cfg = InterestConfig(
        d_model=512, nhead=16, num_layers_enc=6,
        user_input_type="both", photo_input_type="both", fusion_heads=2,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        train_batch_size=B, compute_dtype="bfloat16",
        remat=False, fuse_qkv=True)

    rng = np.random.default_rng(0)
    feat_table = rng.normal(size=(200_000, 1024)).astype(np.float32)
    engine = InterestEngine(cfg, n_users=1903, n_items=352494,
                            feature_table=feat_table)

    batches = [make_batch(rng, B) for _ in range(4)]
    state = engine.init_state(jax.random.PRNGKey(0), batches[0])
    key = jax.random.key(1, impl=cfg.rng_impl)

    # --- device-path steady state (compile + measure) ---
    for i in range(3):
        key, k = jax.random.split(key)
        state, ld = engine.train_step(state, k, batches[i % 4])
    jax.block_until_ready(ld["loss"])
    st = time.perf_counter()
    for i in range(10):
        key, k = jax.random.split(key)
        state, ld = engine.train_step(state, k, batches[i % 4])
    jax.block_until_ready(ld["loss"])
    device_ips = B * 10 / (time.perf_counter() - st)

    # --- instrumented e2e ---
    reader = SeqReader.from_single_csv(SAMPLE_CSV, min_interactions=30,
                                       num_warmup=10)
    store = synthetic_store(reader, rng)
    it = BatchIterator(reader, reader.tables["train"], B, shuffle=True,
                       feature_store=store, seed=7, prefetch_size=2)

    n_rows = len(reader.tables["train"])
    n_slots = -(-n_rows // B) * B

    # --- overlapped path (producer-thread device_put + cross-epoch
    # prefetch) measured in the same process for a like-for-like A/B ---
    it2 = BatchIterator(reader, reader.tables["train"], B, shuffle=True,
                        feature_store=store, seed=7, prefetch_size=2,
                        transform=engine.batch_transform)

    def run_stream(state, key, n_epochs):
        n = 0
        for batch in it2.epochs(n_epochs):
            key, k = jax.random.split(key)
            state, ld = engine.train_step(state, k, batch)
            n += int(batch["row_mask"].sum())
        jax.block_until_ready(ld["loss"])
        return state, key, n

    state, key, _ = run_stream(state, key, 1)   # warm row tables
    st = time.perf_counter()
    state, key, n_ov = run_stream(state, key, args.epochs)
    ov_elapsed = time.perf_counter() - st
    overlap_ips = n_ov / ov_elapsed

    phases = {"iter_wait": 0.0, "put": 0.0, "dispatch": 0.0,
              "epoch_gap": 0.0, "drain": 0.0}

    def run_epoch(state, key, timed):
        n = 0
        gen = iter(it)
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(gen)
            except StopIteration:
                break
            t1 = time.perf_counter()
            dev = engine.put_batch(batch)
            t2 = time.perf_counter()
            key, k = jax.random.split(key)
            params, opt_state, ld = engine._train_step(
                state["params"], state["opt_state"], k, dev,
                engine.feat_table)
            state = {"params": params, "opt_state": opt_state}
            t3 = time.perf_counter()
            if timed:
                phases["iter_wait"] += t1 - t0
                phases["put"] += t2 - t1
                phases["dispatch"] += t3 - t2
            n += int(batch["row_mask"].sum())
        t0 = time.perf_counter()
        jax.block_until_ready(ld["loss"])
        if timed:
            phases["drain"] += time.perf_counter() - t0
        return state, key, n

    state, key, _ = run_epoch(state, key, timed=False)  # warm compile/caches
    st = time.perf_counter()
    n_total = 0
    last_end = None
    for _ in range(args.epochs):
        ep_st = time.perf_counter()
        if last_end is not None:
            phases["epoch_gap"] += ep_st - last_end
        state, key, n = run_epoch(state, key, timed=True)
        last_end = time.perf_counter()
        n_total += n
    elapsed = time.perf_counter() - st
    e2e_ips = n_total / elapsed

    n_steps = args.epochs * (-(-n_rows // B))
    result = {
        "device_ips": round(device_ips, 1),
        "e2e_ips": round(e2e_ips, 1),
        "e2e_vs_device": round(e2e_ips / device_ips, 4),
        "overlap_ips": round(overlap_ips, 1),
        "overlap_vs_device": round(overlap_ips / device_ips, 4),
        "overlap_vs_device_slotwise": round(
            overlap_ips / (n_rows / n_slots) / device_ips, 4),
        "fill_fraction": round(n_rows / n_slots, 4),
        "e2e_vs_device_slotwise": round(
            (n_total / (n_rows / n_slots)) / elapsed / device_ips, 4),
        "elapsed_s": round(elapsed, 3),
        "steps": n_steps,
        "phase_totals_s": {k: round(v, 3) for k, v in phases.items()},
        "phase_per_step_ms": {k: round(1000 * v / n_steps, 2)
                              for k, v in phases.items()},
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
