"""Device-path perf A/B driver (VERDICT r1 items 4/6).

Measures steady-state train-step ips of the flagship SegMM config under one
configuration override per process (remote-compile caching makes multiple
big engines per process unreliable — CLAUDE.md). Results accumulate as JSON
lines in --out for later analysis.

  python tools/perf_ab.py --name base
  python tools/perf_ab.py --name fuseproj --fuse_projections 1
  python tools/perf_ab.py --name b2048 --batch 2048
  python tools/perf_ab.py --name noremat_b512 --batch 512 --remat 0
  python tools/perf_ab.py --name nofused --fused_attention 0
  python tools/perf_ab.py --name evalonly --eval_only 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LINES = 200_000
FEAT_DIM = 1024
USER_MAX = 100


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--remat", type=int, default=1)
    p.add_argument("--remat_scope", default="layer",
                   choices=["layer", "attention"])
    p.add_argument("--fused_attention", type=int, default=1)
    p.add_argument("--fuse_projections", type=int, default=0)
    p.add_argument("--fuse_qkv", type=int, default=0)
    p.add_argument("--fuse_dual", type=int, default=0,
                   help="both stream calls in ONE kernel invocation "
                        "(core/dual_kernel.py)")
    p.add_argument("--fuse_layer", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--input_type", default="both", choices=["both", "id"],
                   help="'id' = the KuaiRand deployment shape: no feature "
                        "table (ID-only embeddings, main_for_seq_leave_"
                        "earlystop_KuaiRand.py:34-42); pair with --n_users/"
                        "--n_items for its vocab (983 / 717,652)")
    p.add_argument("--n_users", type=int, default=1903)
    p.add_argument("--n_items", type=int, default=352494)
    p.add_argument("--eval_only", type=int, default=0)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--nhead", type=int, default=16)
    p.add_argument("--num_layers_enc", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--table_rows", type=int, default=N_LINES,
                   help="feature-table rows (production: 3920483, "
                        "BASELINE.md Table 1)")
    p.add_argument("--table_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="host dtype of the synthetic table (bfloat16 halves "
                        "host RAM and skips the engine-side cast copy)")
    p.add_argument("--table_quant", default="none",
                   choices=["none", "int8"],
                   help="int8 + per-row-scale HBM table (half the bf16 "
                        "footprint; dequant on gather)")
    p.add_argument("--table_synth", default="host",
                   choices=["host", "device"],
                   help="device: synthesize the table directly in HBM with "
                        "jax.random — skips host synthesis AND the H2D "
                        "transfer (~8.4 min for the 4 GB int8 production "
                        "table over the ~8 MB/s axon tunnel); gather/step "
                        "timing is value-independent")
    p.add_argument("--e2e", type=int, default=0,
                   help="also measure the full host pipeline (SeqReader -> "
                        "BatchIterator(transform=batch_transform) -> step) "
                        "against THIS table size: sample CSV rows, "
                        "production-scale gather indices (VERDICT r3 #4)")
    p.add_argument("--e2e_epochs", type=int, default=3)
    p.add_argument("--serving", type=int, default=0,
                   help="after the train-mode measurement, also time the "
                        "eval-only (serving) step on the SAME engine/table "
                        "and add serving_ips/serving_step_ms to the record; "
                        "an intermediate record line is written first so a "
                        "budget kill during the serving compile cannot lose "
                        "the train-mode fields")
    p.add_argument("--profile_dir", default="")
    p.add_argument("--cost_analysis", type=int, default=0,
                   help="print XLA's compiled cost analysis (flops/bytes) "
                        "for the train step")
    p.add_argument("--out", default="/tmp/perf_ab.jsonl")
    args = p.parse_args()
    # the e2e loop drives train_step; pairing it with an eval-only device
    # measurement would record a meaningless train-e2e / eval-device ratio
    if args.e2e and args.eval_only:
        sys.exit("--e2e 1 is a train-pipeline measurement; "
                 "it cannot be combined with --eval_only 1")
    if args.serving and args.eval_only:
        sys.exit("--serving 1 appends an eval-only leg to a TRAIN "
                 "measurement; with --eval_only 1 it is redundant")

    T0 = time.perf_counter()
    from bench import make_batch

    import jax
    from segmminterest_tpu.engine.train import InterestEngine
    from segmminterest_tpu.utils.config import InterestConfig

    cfg = InterestConfig(
        d_model=args.d_model, nhead=args.nhead,
        num_layers_enc=args.num_layers_enc,
        user_input_type=args.input_type, photo_input_type=args.input_type,
        fusion_heads=2,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        train_batch_size=args.batch, compute_dtype=args.compute_dtype,
        remat=bool(args.remat), remat_scope=args.remat_scope,
        fused_attention=bool(args.fused_attention),
        fuse_projections=bool(args.fuse_projections),
        fuse_qkv=bool(args.fuse_qkv), fuse_dual=bool(args.fuse_dual),
        fuse_layer=bool(args.fuse_layer),
        table_quant=args.table_quant)

    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    trace = lambda msg: print(f"[perf_ab +{time.perf_counter() - T0:.0f}s] "
                              f"{msg}", file=sys.stderr, flush=True)
    if args.input_type == "id":
        # ID-only deployment shape: no feature table at all — the model's
        # inputs are the identity-id embeddings (KuaiRand has no visual
        # features; scale lives in the 717k-item embedding instead)
        feat_table = None
        trace("id-only mode: no feature table")
    elif args.table_synth == "device":
        # Synthesize straight into HBM: no host RAM, no tunnel transfer.
        # CHUNK-WISE with input-output aliasing: a single whole-table
        # jax.random draw materializes a uint32 bits transient 4x the int8
        # table (16 GB at production rows) — it either OOMs outright or
        # leaves the arena fragmented so the first train step cannot place
        # its temps (r4 measured: RESOURCE_EXHAUSTED at step compile even
        # though the table itself fit). Allocate the table first (lowest
        # arena offset), then fill 256k-row slabs in place via donation;
        # peak transient = one slab's random bits (~1 GB).
        chunk_rows = min(262_144, args.table_rows)

        def fill_loop(tab, draw):
            fn = jax.jit(draw, donate_argnums=0)
            key = jax.random.PRNGKey(0)
            for start in range(0, args.table_rows, chunk_rows):
                key, k = jax.random.split(key)
                # dynamic_update_slice clamps the start so the final
                # partial slab overlaps the previous one — harmless here
                # (values are random; every row gets initialized)
                tab = fn(tab, k, jnp.int32(start))
            jax.block_until_ready(tab)
            return tab

        if args.table_quant == "int8":
            def draw_q(tab, k, start):
                chunk = jax.random.randint(
                    k, (chunk_rows, FEAT_DIM), -127, 128, dtype=jnp.int8)
                return jax.lax.dynamic_update_slice(tab, chunk, (start, 0))
            q = fill_loop(jnp.zeros((args.table_rows, FEAT_DIM), jnp.int8),
                          draw_q)
            s = jax.random.uniform(jax.random.PRNGKey(1),
                                   (args.table_rows, 1), jnp.float32,
                                   1e-3, 2e-2)
            feat_table = (q, s)
            jax.block_until_ready(s)
        else:
            dt = (jnp.bfloat16 if args.table_dtype == "bfloat16"
                  else jnp.float32)
            def draw_f(tab, k, start):
                chunk = jax.random.normal(k, (chunk_rows, FEAT_DIM), dt)
                return jax.lax.dynamic_update_slice(tab, chunk, (start, 0))
            feat_table = fill_loop(
                jnp.zeros((args.table_rows, FEAT_DIM), dt), draw_f)
        trace("table synthesized on device")
    elif args.table_quant == "int8":
        # Synthesize the table from ONE random chunk tiled to size:
        # gather/step timing is value-independent, and a fresh draw +
        # ml_dtypes bf16 cast per chunk costs ~30 min of host CPU at
        # production row counts (the round-3 int8 measurement lost a whole
        # 2400 s budget to it). Pre-quantized chunk-wise (engine accepts
        # the (int8, scale) pair): never materializes the float table.
        chunk_rows = min(262_144, args.table_rows)
        chunk = rng.standard_normal((chunk_rows, FEAT_DIM), dtype=np.float32)
        from segmminterest_tpu.core.numerics import quantize_table_int8
        qc, sc = quantize_table_int8(chunk)
        q = np.empty((args.table_rows, FEAT_DIM), np.int8)
        s = np.empty((args.table_rows, 1), np.float32)
        for start in range(0, args.table_rows, chunk_rows):
            stop = min(start + chunk_rows, args.table_rows)
            q[start:stop] = qc[:stop - start]
            s[start:stop] = sc[:stop - start]
        feat_table = (q, s)
        trace("host table built")
    else:
        chunk_rows = min(262_144, args.table_rows)
        chunk = rng.standard_normal((chunk_rows, FEAT_DIM), dtype=np.float32)
        dt = jnp.bfloat16 if args.table_dtype == "bfloat16" else np.float32
        chunk = chunk.astype(dt)
        feat_table = np.empty((args.table_rows, FEAT_DIM), dt)
        for start in range(0, args.table_rows, chunk_rows):
            stop = min(start + chunk_rows, args.table_rows)
            feat_table[start:stop] = chunk[:stop - start]
        trace("host table built")
    engine = InterestEngine(cfg, n_users=args.n_users, n_items=args.n_items,
                            feature_table=feat_table)
    trace("table resident on device")

    batches = [make_batch(rng, args.batch, n_lines=args.table_rows,
                          n_users=args.n_users, n_items=args.n_items)
               for _ in range(4)]
    state = engine.init_state(jax.random.PRNGKey(0), batches[0])
    trace("params initialized")
    key = jax.random.key(1, impl=cfg.rng_impl)

    def step(i, state, key):
        key, k = jax.random.split(key)
        if args.eval_only:
            out = engine.eval_step(state, batches[i % 4])
            return state, key, out[0]["loss"]
        state, loss_dict = engine.train_step(state, k, batches[i % 4])
        return state, key, loss_dict["loss"]

    for i in range(args.warmup):
        state, key, loss = step(i, state, key)
    jax.block_until_ready(loss)
    trace("warmup done (step compiled)")

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    st = time.perf_counter()
    for i in range(args.steps):
        state, key, loss = step(i, state, key)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - st
    if args.profile_dir:
        jax.profiler.stop_trace()

    ips = args.batch * args.steps / elapsed
    trace(f"device path measured: {ips:.1f} ips")

    e2e = {}
    if args.e2e:
        # Full host pipeline at THIS table scale (VERDICT r3 #4): sample CSV
        # rows, lineid map spread over the full table, producer-thread
        # device_put (engine.batch_transform), cross-epoch streaming.
        # NOTE: mirrors bench.py measure()'s e2e section (same iterator
        # wiring, warm epoch, fill-fraction math; field names differ by
        # design — bench's driver record vs this matrix row). A methodology
        # change there must land here too.
        from bench import SAMPLE_CSV, synthetic_store
        from segmminterest_tpu.data.dataset import BatchIterator
        from segmminterest_tpu.data.reader import SeqReader
        if not os.path.exists(SAMPLE_CSV):
            e2e = {"e2e_error": "sample csv unavailable"}
        else:
            reader = SeqReader.from_single_csv(
                SAMPLE_CSV, min_interactions=30, num_warmup=10)
            # id-only mode: no feature store — the iterator ships labels +
            # identity ids only (the KuaiRand host pipeline)
            store = None if args.input_type == "id" else synthetic_store(
                reader, rng, n_lines=args.table_rows,
                feat=np.zeros((1, FEAT_DIM), np.float32))
            it = BatchIterator(reader, reader.tables["train"], args.batch,
                               shuffle=True, feature_store=store, seed=7,
                               prefetch_size=2,
                               transform=engine.batch_transform)

            def run_epochs(state, key, n_epochs):
                n = 0
                loss = None
                for batch in it.epochs(n_epochs):
                    key, k = jax.random.split(key)
                    state, loss_dict = engine.train_step(state, k, batch)
                    n += int(batch["row_mask"].sum())
                    loss = loss_dict["loss"]
                jax.block_until_ready(loss)
                return state, key, n

            state, key, _ = run_epochs(state, key, 1)  # warm + compile
            trace("e2e warm epoch done")
            st = time.perf_counter()
            state, key, n_total = run_epochs(state, key, args.e2e_epochs)
            e2e_elapsed = time.perf_counter() - st
            e2e_ips = n_total / e2e_elapsed
            n_rows = len(reader.tables["train"])
            fill = n_rows / (-(-n_rows // args.batch) * args.batch)
            e2e = {"e2e_ips": round(e2e_ips, 1),
                   "e2e_vs_device": round(e2e_ips / ips, 3),
                   "e2e_fill_fraction": round(fill, 4),
                   "e2e_vs_device_slotwise": round(e2e_ips / fill / ips, 3)}
            trace(f"e2e measured: {e2e_ips:.1f} ips")

    cost = {}
    if args.cost_analysis:
        try:
            lowered = engine._train_step.lower(
                state["params"], state["opt_state"],
                jax.random.key(0, impl=cfg.rng_impl),
                engine.put_batch(batches[0]), engine.feat_table)
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            cost = {"xla_flops": ca.get("flops"),
                    "xla_bytes": ca.get("bytes accessed")}
        except Exception as e:  # noqa: BLE001 — diagnostic only
            cost = {"cost_error": str(e)}
    rec = {"name": args.name, "ips": round(ips, 1),
           "step_ms": round(1000 * elapsed / args.steps, 2),
           "batch": args.batch, "remat": args.remat,
           "remat_scope": args.remat_scope,
           "fused_attention": args.fused_attention,
           "fuse_projections": args.fuse_projections,
           "fuse_qkv": args.fuse_qkv, "fuse_dual": args.fuse_dual,
           "fuse_layer": args.fuse_layer,
           "table_quant": args.table_quant,
           "table_rows": args.table_rows, "table_synth": args.table_synth,
           "eval_only": args.eval_only, "dtype": args.compute_dtype,
           **e2e, **cost}

    def append_record(r):
        line = json.dumps(r)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    if args.serving:
        # write the train-mode record FIRST: if the caller's budget kills
        # this process mid-serving-compile, the train fields survive
        append_record(rec)
        try:
            def eval_step(i):
                out = engine.eval_step(state, batches[i % 4])
                return out[0]["loss"]
            for i in range(args.warmup):
                loss = eval_step(i)
            jax.block_until_ready(loss)
            trace("serving warmup done (eval step compiled)")
            st = time.perf_counter()
            for i in range(args.steps):
                loss = eval_step(i)
            jax.block_until_ready(loss)
            sv_elapsed = time.perf_counter() - st
            rec = dict(rec,
                       serving_ips=round(args.batch * args.steps
                                         / sv_elapsed, 1),
                       serving_step_ms=round(1000 * sv_elapsed
                                             / args.steps, 2))
            trace(f"serving measured: {rec['serving_ips']} ips")
        except Exception as e:  # noqa: BLE001 — keep the train record
            rec = dict(rec, serving_error=f"{type(e).__name__}: {e}"[:200])
    append_record(rec)


if __name__ == "__main__":
    main()
