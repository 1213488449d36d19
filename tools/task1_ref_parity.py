"""Full training-run parity for Task 1 on the sample CSV (VERDICT r2 #4).

Trains the REFERENCE torch model (encoder.py + decoder_leave_focal.py,
executed from /root/reference via tools/ref_torch_loader) with the reference
training protocol (main_for_seq_leave_earlystop_SegMM.py:213-459: AdamW
lr/wd, global-norm clip 10.0, valid every valid_step batches with
eval-before-training, HR@5 best-checkpoint + early stop, final test with
TOP_K_leave permutation ranking from the reference's own my_evaluation.py)
and OUR engine.run_training with identical hyperparameters, both over the
identical data stream (same SeqReader splits, same synthetic feature table,
same BatchIterator batches). Compares final test HR@{1,3,5,10}/NDCG and the
validation HR@5 trajectory.

A third run prices PARITY D7 (the pool-cap deviation): ours with the
candidate-pool cap lifted vs the default 4x cap.

  python tools/task1_ref_parity.py --out /tmp/task1_parity.json

Wall-clock: ~15-25 min on the 1-CPU box (three training runs to
convergence at tiny dims).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SAMPLE_CSV = "/root/reference/SegMM_inter_sample.csv"

# tiny-but-real configuration: full 'both' dual-backbone mode, the paper's
# losses, small dims so torch-CPU convergence is tractable
D, HEADS, LAYERS, FF = 32, 4, 2, 32
FEAT = 64
N_LINES = 50_000
BATCH = 256
LR, WD = 1e-3, 1e-4
VALID_STEP = 10
EARLY_STOP = 5
EPOCHS = 6
SEED = 42


def build_store(reader, rng):
    """Synthetic feature table whose lineid map covers every (video, frame)
    the sample data requests (bench.synthetic_store at tool dims), with a
    LEARNABLE signal embedded: the first 8 feature dims carry the
    per-(video, segment) watch-through rate measured on the train split, so
    both implementations have real structure to fit and the comparison is
    not dominated by the degenerate no-signal collapse."""
    from segmminterest_tpu.data.feature_store import FeatureStore

    need: dict = {}
    for t in reader.tables.values():
        if not len(t):
            continue
        n_frames = (t.labels != -2).sum(1)
        durs = -(-t.duration_ms // 5000)
        for vid, nf, d in zip(t.video_raw, n_frames, durs):
            need[int(vid)] = max(need.get(int(vid), 0), int(nf), int(d))
    for frames in reader.user_input_dict.values():
        for pf in frames:
            pid_s, frame_s = pf.split("_")
            need[int(pid_s)] = max(need.get(int(pid_s), 0), int(frame_s) + 1)
    lineid_map = {}
    line = 0
    for pid, n in need.items():
        for f in range(n):
            lineid_map[f"{pid}-{f}"] = line % N_LINES
            line += 1
    feat = rng.normal(size=(N_LINES, FEAT)).astype(np.float32)

    tr = reader.tables["train"]
    watched = np.zeros((0,))
    counts: dict = {}
    hits: dict = {}
    for r in range(len(tr)):
        pid = int(tr.video_raw[r])
        lab = tr.labels[r]
        for f in range(int((lab != -2).sum())):
            key = (pid, f)
            counts[key] = counts.get(key, 0) + 1
            hits[key] = hits.get(key, 0) + int(lab[f] == 1)
    for (pid, f), c in counts.items():
        lid = lineid_map.get(f"{pid}-{f}")
        if lid is not None:
            rate = hits[(pid, f)] / c
            feat[lid, :8] += 4.0 * (rate - 0.5)
    return FeatureStore(feat, lineid_map)


def our_config(pool_cap=None, table_quant="none"):
    from segmminterest_tpu.utils.config import InterestConfig
    return InterestConfig(
        d_model=D, nhead=HEADS, num_layers_enc=LAYERS,
        user_input_type="both", photo_input_type="both", fusion_heads=2,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        train_batch_size=BATCH, valid_batch_size=BATCH, test_batch_size=BATCH,
        learning_rate=LR, weight_decay=WD, valid_step=VALID_STEP,
        early_stop=EARLY_STOP, epochs=EPOCHS, seed=SEED,
        compute_dtype="float32", remat=False,
        pool_cap=pool_cap, table_quant=table_quant)


def run_ours(reader, store, pool_cap=None, tag="ours", table_quant="none"):
    import tempfile

    from segmminterest_tpu.engine.train import run_training

    cfg = our_config(pool_cap=pool_cap, table_quant=table_quant)
    st = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        result = run_training(cfg, reader, feature_store=store, work_dir=tmp)
    return {
        "tag": tag,
        "test": result["test_metrics"],
        "valid_hr5": result["valid_metrics"]["HR@5"],
        "steps": result["steps"],
        "seconds": round(time.time() - st, 1),
    }


def make_to_torch(feat):
    """Fixed-shape index batch -> the reference's ragged tensor batch
    (dataloader_SegMM.py DataCollator output + the main loop's L1
    normalization, main_…SegMM.py:271-273)."""
    import torch

    def to_torch(batch):
        rm = batch["row_mask"]
        photo = feat[np.clip(batch["photo_lines"][rm], 0, None)]
        photo = photo * (batch["vid_mask"][rm][..., None])
        user = feat[np.clip(batch["user_lines"][rm], 0, None)]
        user = user * (batch["user_mask"][rm][..., None])
        t = {
            "user": torch.tensor(user, dtype=torch.float32),
            "photo": torch.tensor(photo, dtype=torch.float32),
            "user_identity_id": torch.tensor(
                batch["user_identity_id"][rm].astype(np.int64)),
            "photo_identity_id": torch.tensor(
                batch["photo_identity_id"][rm].astype(np.int64)),
            "user_mask": torch.tensor(batch["user_mask"][rm]),
            "photo_mask": torch.tensor(batch["vid_mask"][rm]),
            "label": torch.tensor(batch["label"][rm].astype(np.int64)),
        }
        t["user"] = t["user"] / (t["user"].norm(p=1, dim=-1, keepdim=True)
                                 + 1e-6)
        t["photo"] = t["photo"] / (t["photo"].norm(p=1, dim=-1, keepdim=True)
                                   + 1e-6)
        return t

    return to_torch


def run_reference(reader, store):
    """The reference training loop, fed by our BatchIterator (identical
    splits + features; ragged rows restored via row_mask stripping)."""
    import torch

    import ref_torch_loader as rtl
    from segmminterest_tpu.data.dataset import BatchIterator

    torch.manual_seed(SEED)
    np.random.seed(SEED)

    ref_modules = rtl.load_ref_modules()
    ref_eval = rtl.load_ref_evaluation()
    args = rtl.make_ref_args(d_model=D, nhead=HEADS, num_layers_enc=LAYERS)
    model = rtl.build_ref_model(
        ref_modules, args, d=D, heads=HEADS, layers=LAYERS, ff=FF,
        feat=FEAT, lv=40, usr_max_img=100, n_users=reader.n_users,
        n_items=reader.n_items)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)

    def make_iter(split, shuffle):
        return BatchIterator(reader, reader.tables[split], BATCH,
                             shuffle=shuffle, feature_store=store, seed=SEED)

    train_iter = make_iter("train", True)
    valid_iter = make_iter("dev", False)
    test_iter = make_iter("test", False)
    to_torch = make_to_torch(store.feat)

    def run_valid():
        model.eval()
        hr5s, losses = [], []
        with torch.no_grad():
            for batch in valid_iter:
                t = to_torch(batch)
                out = model(usr_image=t["user"],
                            usr_id=t["user_identity_id"],
                            usr_mask=t["user_mask"],
                            vid_image=t["photo"],
                            vid_id=t["photo_identity_id"],
                            vid_mask=t["photo_mask"],
                            gt=t["label"], mode="train")
                interests = torch.sigmoid(out["logits"]).numpy() \
                    * np.asarray(args.exposure_prob)[None, :]
                gt = out["gt"].numpy()
                view_lengths = (gt == 1).sum(axis=1, keepdims=True)
                mask_batch = gt != -2
                ev = ref_eval.TOP_K_leave(interests, view_lengths,
                                          mask_batch, permutation=True)
                hr5s.append(float(ev["HR@5"]))
                losses.append(float(out["loss"]))
        model.train()
        return float(np.mean(hr5s)), float(np.mean(losses))

    valid_hr5 = []
    hr5, _ = run_valid()   # evaluation before training (main_…SegMM.py:249)
    valid_hr5.append(hr5)
    # the reference checkpoints ONLY at valid steps inside the train loop
    # (:333); the pre-training eval is logged but never saved, so the best
    # state starts as the untrained model only until the first valid step
    best_hr5 = -float("inf")
    best_state = {k: v.clone() for k, v in model.state_dict().items()}
    st = time.time()
    stop_flag = False
    global_step = 0
    for epoch in range(EPOCHS):
        if stop_flag:
            break
        for local_step, batch in enumerate(train_iter):
            t = to_torch(batch)
            opt.zero_grad()
            model.train()
            out = model(usr_image=t["user"], usr_id=t["user_identity_id"],
                        usr_mask=t["user_mask"], vid_image=t["photo"],
                        vid_id=t["photo_identity_id"],
                        vid_mask=t["photo_mask"], gt=t["label"],
                        mode="train")
            out["loss"].backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
            opt.step()
            global_step += 1
            if (local_step + 1) % VALID_STEP == 0:
                hr5, vloss = run_valid()
                valid_hr5.append(hr5)
                print(f"[ref] step {global_step} valid HR@5={hr5:.4f} "
                      f"loss={vloss:.4f}", flush=True)
                if hr5 > best_hr5:
                    best_hr5 = hr5
                    best_state = {k: v.clone()
                                  for k, v in model.state_dict().items()}
                # reference early stop (main_…SegMM.py:336-353): stop when
                # the last EARLY_STOP validations are non-increasing from
                # the window head, or the best lies > EARLY_STOP back
                h = valid_hr5
                if EARLY_STOP > 0:
                    if len(h) > EARLY_STOP:
                        last = h[-EARLY_STOP:]
                        if all(last[0] >= y for y in last[1:]):
                            stop_flag = True
                            break
                    if len(h) - h.index(max(h)) > EARLY_STOP:
                        stop_flag = True
                        break

    # final test with the best checkpoint (main_…SegMM.py:365-459)
    model.load_state_dict(best_state)
    model.eval()
    # unweighted per-batch mean, matching the reference's results_list
    # aggregation (main_…SegMM.py:188-210) and our compute_final_result
    results = {f"{m}@{k}": [] for m in ("HR", "NDCG")
               for k in (1, 3, 5, 10)}
    with torch.no_grad():
        for batch in test_iter:
            t = to_torch(batch)
            out = model(usr_image=t["user"], usr_id=t["user_identity_id"],
                        usr_mask=t["user_mask"], vid_image=t["photo"],
                        vid_id=t["photo_identity_id"],
                        vid_mask=t["photo_mask"], gt=t["label"],
                        mode="train")
            interests = torch.sigmoid(out["logits"]).numpy() \
                * np.asarray(args.exposure_prob)[None, :]
            gt = out["gt"].numpy()
            view_lengths = (gt == 1).sum(axis=1, keepdims=True)
            ev = ref_eval.TOP_K_leave(interests, view_lengths, gt != -2,
                                      permutation=True)
            for key in results:
                results[key].append(float(ev[key]))
    test = {k: sum(v) / len(v) for k, v in results.items()}
    return {"tag": "reference", "test": test, "valid_hr5": valid_hr5,
            "steps": global_step, "seconds": round(time.time() - st, 1)}


def run_throughput(reader, store, warmup, steps, d_model=None, heads=None,
                   layers=None, batch=None):
    """Same-hardware throughput control (VERDICT r2 weak #1): the reference
    torch training step vs our engine's jitted step, identical math
    (float32, same dims, same batches), both on this CPU. The A100 divisor
    in bench.py cannot be measured in this environment; this measures the
    pure framework/compiler ratio on hardware both sides CAN run on.

    Protocol is generous to the reference: its batches are pre-converted to
    torch tensors OUTSIDE the timed loop (in real training the reference
    pays that per step in its collator), while our timed loop includes
    put_batch host->device staging; each of our steps blocks on the loss.
    """
    import torch

    import jax
    import ref_torch_loader as rtl
    from segmminterest_tpu.data.dataset import BatchIterator
    from segmminterest_tpu.engine.train import InterestEngine

    d = d_model or D
    h = heads or HEADS
    nl = layers or LAYERS
    bsz = batch or BATCH

    torch.manual_seed(SEED)
    np.random.seed(SEED)
    torch.set_num_threads(os.cpu_count() or 1)

    batches = list(BatchIterator(reader, reader.tables["train"], bsz,
                                 shuffle=True, feature_store=store,
                                 seed=SEED))
    if not batches:
        raise RuntimeError("no train batches")

    # --- reference torch step -------------------------------------------
    ref_modules = rtl.load_ref_modules()
    args = rtl.make_ref_args(d_model=d, nhead=h, num_layers_enc=nl)
    model = rtl.build_ref_model(
        ref_modules, args, d=d, heads=h, layers=nl, ff=d,
        feat=FEAT, lv=40, usr_max_img=100, n_users=reader.n_users,
        n_items=reader.n_items)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    to_torch = make_to_torch(store.feat)

    torch_batches = [to_torch(b) for b in batches]
    # mean row count over the batch indices the timed loops actually use
    # (both sides cycle batches[i % len(batches)] for `steps` iterations),
    # not over the whole epoch — ADVICE r3
    rows = float(np.mean([int(batches[i % len(batches)]["row_mask"].sum())
                          for i in range(steps)]))

    def ref_step(t):
        opt.zero_grad()
        out = model(usr_image=t["user"], usr_id=t["user_identity_id"],
                    usr_mask=t["user_mask"], vid_image=t["photo"],
                    vid_id=t["photo_identity_id"], vid_mask=t["photo_mask"],
                    gt=t["label"], mode="train")
        out["loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    model.train()
    for i in range(warmup):
        ref_step(torch_batches[i % len(torch_batches)])
    st = time.time()
    for i in range(steps):
        ref_step(torch_batches[i % len(torch_batches)])
    ref_s = (time.time() - st) / steps
    del model, opt, torch_batches

    # --- our jitted step -------------------------------------------------
    cfg = our_config()
    cfg.d_model, cfg.nhead, cfg.num_layers_enc = d, h, nl
    cfg.train_batch_size = cfg.valid_batch_size = bsz
    engine = InterestEngine(cfg, n_users=reader.n_users,
                            n_items=reader.n_items,
                            feature_table=np.asarray(store.feat))
    rng = jax.random.key(SEED, impl=cfg.rng_impl)
    state = engine.init_state(rng, batches[0])
    for i in range(warmup):
        state, loss = engine.train_step(state, rng,
                                        batches[i % len(batches)])
        jax.block_until_ready(loss)
    st = time.time()
    for i in range(steps):
        state, loss = engine.train_step(state, rng,
                                        batches[i % len(batches)])
        jax.block_until_ready(loss)
    ours_s = (time.time() - st) / steps

    res = {
        "tag": "throughput_cpu",
        "dims": {"d_model": d, "nhead": h, "layers": nl, "batch": bsz,
                 "rows_per_batch": round(rows, 1)},
        "reference_s_per_step": round(ref_s, 4),
        "ours_s_per_step": round(ours_s, 4),
        "reference_ips": round(rows / ref_s, 1),
        "ours_ips": round(rows / ours_s, 1),
        "ours_over_reference": round(ref_s / ours_s, 3),
        "steps": steps, "warmup": warmup,
    }
    print(json.dumps(res, indent=2), flush=True)
    return res


def main():
    global EPOCHS, SEED, D, HEADS, LAYERS, FF, BATCH
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/task1_parity.json")
    # --skip_pool_cap removed (round 4): pools are always exact (PARITY D7)
    p.add_argument("--epochs", type=int, default=EPOCHS,
                   help="override the training length (smoke: 1)")
    p.add_argument("--seed", type=int, default=SEED)
    # training-run-mode dim overrides (VERDICT r4 #2: mid-dims run parity;
    # d=128/4-layer is the largest shape where the reference torch side
    # steps at feasible CPU speed, ~22 ips — BASELINE.md control)
    p.add_argument("--d_model", type=int, default=0,
                   help="override model dims for the TRAINING-RUN "
                        "comparison (default: tool dims d=32/2-layer)")
    p.add_argument("--nhead", type=int, default=0)
    p.add_argument("--layers", type=int, default=0)
    p.add_argument("--ff", type=int, default=0,
                   help="feed-forward width (default: tracks --d_model)")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--throughput", type=int, default=0,
                   help="instead of the training-run comparison, time the "
                        "reference torch step vs our jitted step on this "
                        "CPU (same dims, batches, float32) and report the "
                        "ips ratio — the measured same-hardware control "
                        "for bench.py's estimated A100 divisor")
    p.add_argument("--tp_warmup", type=int, default=3)
    p.add_argument("--tp_steps", type=int, default=15)
    p.add_argument("--tp_d_model", type=int, default=0,
                   help="throughput-mode dim override (default: tool dims)")
    p.add_argument("--tp_nhead", type=int, default=0)
    p.add_argument("--tp_layers", type=int, default=0)
    p.add_argument("--tp_batch", type=int, default=0)
    p.add_argument("--int8_ab", type=int, default=0,
                   help="instead of the reference comparison, A/B OUR run "
                        "with the fp32 vs int8-quantized feature table "
                        "(PARITY D8 quality pricing; no torch run)")
    args = p.parse_args()
    EPOCHS = args.epochs
    SEED = args.seed
    if args.d_model:
        D = args.d_model
        FF = args.ff or args.d_model
    if args.nhead:
        HEADS = args.nhead
    if args.layers:
        LAYERS = args.layers
    if args.batch:
        BATCH = args.batch

    import jax
    # unconditional: querying jax.default_backend() first would INITIALIZE
    # the axon backend, which hangs indefinitely when the TPU tunnel is
    # wedged — this tool is CPU-only by design (torch reference parity)
    jax.config.update("jax_platforms", "cpu")

    from segmminterest_tpu.data.reader import SeqReader

    rng = np.random.default_rng(0)
    reader = SeqReader.from_single_csv(SAMPLE_CSV, min_interactions=30,
                                       num_warmup=10)
    store = build_store(reader, rng)

    runs = []
    if args.throughput:
        res = run_throughput(reader, store, args.tp_warmup, args.tp_steps,
                             d_model=args.tp_d_model or None,
                             heads=args.tp_nhead or None,
                             layers=args.tp_layers or None,
                             batch=args.tp_batch or None)
        with open(args.out, "w") as f:
            json.dump([res], f, indent=2)
        print(f"wrote {args.out}")
        return
    if args.int8_ab:
        print("=== our run (fp32 table) ===", flush=True)
        runs.append(run_ours(reader, store, tag="ours_fp32"))
        print(json.dumps(runs[-1]["test"], indent=2), flush=True)
        print("=== our run (int8 table, PARITY D8 pricing) ===", flush=True)
        runs.append(run_ours(reader, store, tag="ours_int8",
                             table_quant="int8"))
        print(json.dumps(runs[-1]["test"], indent=2), flush=True)
        with open(args.out, "w") as f:
            json.dump(runs, f, indent=2)
        print(f"wrote {args.out}")
        for r in runs:
            keys = ("HR@1", "HR@5", "NDCG@5", "HR@10", "NDCG@10")
            row = " ".join(f"{k}={r['test'][k]:.4f}" for k in keys
                           if k in r["test"])
            print(f"{r['tag']:>14}: {row}  (steps={r['steps']}, "
                  f"{r['seconds']}s)")
        return

    print("=== reference torch run ===", flush=True)
    runs.append(run_reference(reader, store))
    print(json.dumps(runs[-1]["test"], indent=2), flush=True)
    print("=== our run (exact reference pools, PARITY D7 closed) ===",
          flush=True)
    runs.append(run_ours(reader, store, tag="ours"))
    print(json.dumps(runs[-1]["test"], indent=2), flush=True)
    # round 4: pool_cap is deprecated/ignored — the per-user-stream pool
    # layout always gives exact reference pool semantics, so the former
    # capped/uncapped A/B arms collapsed into the single run above

    with open(args.out, "w") as f:
        json.dump(runs, f, indent=2)
    print(f"wrote {args.out}")
    for r in runs:
        keys = ("HR@1", "HR@5", "NDCG@5", "HR@10", "NDCG@10")
        row = " ".join(f"{k}={r['test'][k]:.4f}" for k in keys
                       if k in r["test"])
        print(f"{r['tag']:>14}: {row}  (steps={r['steps']}, "
              f"{r['seconds']}s)")


if __name__ == "__main__":
    main()
