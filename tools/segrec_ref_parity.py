"""Task-2 (SegRec) full training-run cross-framework parity (VERDICT r4 #1).

Trains the REFERENCE SegRec fork (torch, CPU, executed from a scratch copy of
/root/reference/SegRec with the main.py:44-99 protocol: ContextReader /
ContextSeqReader corpus, CTRRunner per-epoch dev eval + early stop on AUC +
best-checkpoint reload, helpers/CTRRunner.py:22-43 metrics) and OUR
segrec/main.py on the IDENTICAL dataset directory (build_segrec_data output
from the sample csv) with the IDENTICAL synthetic Task-1 clip-weight table,
then compares best-upon-valid dev/test AUC/F1_SCORE/LOG_LOSS/ACC.

The two Clip* models exercised are the paper's Task-2 contribution heads:
  ClipWDRecCTR   (context family;     models/context/ClipWDRec.py)
  ClipDINRecCTR  (context_seq family; models/context_seq/ClipDINRec.py)

The clip weights are keyed "{user}-{item}-{time}" over dense ids — the
reference's 'SegMM_CTR' dataset branch (models/BaseModel.py:377-392); the
dataset-dir id2user/id2item jsons are removed from the scratch data dir so
our ClipWeights takes the same dense-key path.

Nothing of the reference enters the repo — only measured numbers go into
PARITY.md / docs/artifacts/.

  python tools/segrec_ref_parity.py --model ClipWDRec --seeds 1,2,3
  python tools/segrec_ref_parity.py --model ClipDINRec --seeds 1,2,3

Wall-clock: ClipWDRec ~10-20 min/seed both sides together; ClipDINRec is
dominated by the reference torch side (~40 clip x 20 history attention rows
per sample on one CPU core).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/SegRec"
SAMPLE_CSV = "/root/reference/SegMM_inter_sample.csv"

sys.path.insert(0, REPO)

CLIP_NUM = 40

# identical hyperparameters on both sides (reference parser defaults:
# helpers/BaseRunner.py:20-50, models/context/ClipWDRec.py:17-29)
LR, L2, BATCH = 1e-3, 0.0, 512
EMB = 64
METRICS = "AUC,F1_SCORE,LOG_LOSS,ACC"
HIST_MAX = 20


def synth_clip_weights(u, i, t, label):
    """Deterministic per-(user,item,time) 40-dim interest profile standing in
    for exported Task-1 logits: front-loaded decay, label-correlated lift,
    small key-seeded noise. Both frameworks read the same values."""
    seed = (int(u) * 1000003 + int(i) * 10007 + int(t)) % (2**32)
    rng = np.random.default_rng(seed)
    base = np.linspace(1.0, 0.3, CLIP_NUM)
    w = 0.45 * base + 0.35 * float(label) * base + 0.1 * rng.random(CLIP_NUM)
    return np.round(w, 4).tolist()


def build_dataset(workdir: str, data_seed: int = 2024,
                  min_interactions: int = 30, num_warmup: int = 10) -> str:
    """Sample csv -> ReChorus-layout SegMM_CTR dataset + dense-key clip
    weights; returns the clip_weight json path."""
    import pandas as pd

    from segmminterest_tpu.tasks.build_segrec_data import main as build_main

    data_dir = os.path.join(workdir, "data")
    ds_dir = os.path.join(data_dir, "SegMM_CTR")
    cw_path = os.path.join(workdir, "clip_weights.json")
    if os.path.exists(cw_path) and os.path.exists(
            os.path.join(ds_dir, "train.csv")):
        return cw_path
    os.makedirs(data_dir, exist_ok=True)
    build_main(["--inter_csv", SAMPLE_CSV, "--out", data_dir,
                "--name", "SegMM", "--min_interactions",
                str(min_interactions), "--num_warmup", str(num_warmup),
                "--seed", str(data_seed)])
    # dense-key clip weights on both sides: drop the dataset-dir id maps so
    # our ClipWeights skips the raw-id remap (segrec/main.py only remaps
    # when the jsons exist), matching the reference's SegMM_CTR branch
    for name in ("id2user.json", "id2item.json"):
        for ds in ("SegMM_CTR", "SegMM"):
            p = os.path.join(data_dir, ds, name)
            if os.path.exists(p):
                os.remove(p)
    # the reference Dataset.__init__ loads KuaiMM/id2{user,item}.json
    # unconditionally whenever clip_weight_path is set (BaseModel.py:132-136)
    kuai = os.path.join(data_dir, "KuaiMM")
    os.makedirs(kuai, exist_ok=True)
    for name in ("id2user.json", "id2item.json"):
        with open(os.path.join(kuai, name), "w") as f:
            json.dump({}, f)

    table = {}
    for split in ("train", "dev", "test"):
        df = pd.read_csv(os.path.join(ds_dir, split + ".csv"), sep="\t")
        for u, i, t, y in zip(df["user_id"], df["item_id"], df["time"],
                              df["label"]):
            table[f"{u}-{i}-{t}"] = synth_clip_weights(u, i, t, y)
    with open(cw_path, "w") as f:
        json.dump(table, f)
    print(f"dataset ready: {ds_dir} ({len(table)} clip-weight keys)")
    return cw_path


REF_DRIVER = r'''
import argparse, json, logging, os, sys
import numpy as np
# the reference targets numpy<1.24 (np.object in BaseModel.py:177)
for _name, _val in (("object", object), ("bool", bool),
                    ("int", int), ("float", float)):
    if not hasattr(np, _name):
        setattr(np, _name, _val)
import torch

cfg = json.loads(sys.argv[1])
logging.basicConfig(level=logging.INFO, stream=sys.stderr)

from utils import utils
from helpers.CTRRunner import CTRRunner
if cfg["model"] == "ClipWDRec":
    from helpers.ContextReader import ContextReader as Reader
    from models.context.ClipWDRec import ClipWDRecCTR as Model
else:
    from helpers.ContextSeqReader import ContextSeqReader as Reader
    from models.context_seq.ClipDINRec import ClipDINRecCTR as Model

parser = argparse.ArgumentParser()
parser = Reader.parse_data_args(parser)
parser = CTRRunner.parse_runner_args(parser)
parser = Model.parse_model_args(parser)
argv = ["--path", cfg["path"], "--dataset", "SegMM_CTR", "--sep", "\t",
        "--include_item_features", "1", "--include_user_features", "0",
        "--include_situation_features", "0",
        "--epoch", str(cfg["epochs"]), "--early_stop", str(cfg["early_stop"]),
        "--lr", str(cfg["lr"]), "--l2", str(cfg["l2"]),
        "--batch_size", str(cfg["batch"]), "--eval_batch_size",
        str(cfg["batch"]), "--num_workers", "0", "--pin_memory", "0",
        "--metric", cfg["metrics"], "--main_metric", "",
        "--optimizer", "Adam", "--duration_mask", "1",
        "--emb_size", str(cfg["emb"]),
        "--clip_weight_path", cfg["clip_weight_path"],
        "--model_path", cfg["model_path"]]
if cfg["model"] == "ClipWDRec":
    argv += ["--layers", "[64]"]
else:
    argv += ["--att_layers", "[64]", "--dnn_layers", "[64]",
             "--history_max", str(cfg["history_max"])]
args, extras = parser.parse_known_args(argv)
args.device = torch.device("cpu")
args.train = 1
args.log_file = os.path.join(os.path.dirname(cfg["model_path"]), "ref.log")

utils.init_seed(cfg["seed"])
corpus = Reader(args)
model = Model(args, corpus).to(args.device)
data_dict = {}
for phase in ("train", "dev", "test"):
    data_dict[phase] = Model.Dataset(model, corpus, phase)
    data_dict[phase].prepare()
runner = CTRRunner(args)
runner.train(data_dict)   # early stop on dev AUC, reloads best checkpoint
dev = runner.evaluate(data_dict["dev"], [5], runner.metrics)
test = runner.evaluate(data_dict["test"], [5], runner.metrics)
print("REF_RESULT " + json.dumps({"dev": dev, "test": test}, default=float))
'''


def run_reference(workdir, model, seed, epochs, early_stop, timeout):
    src = os.path.join(workdir, "src")
    if not os.path.exists(os.path.join(src, "main.py")):
        shutil.copytree(REF_SRC, src, dirs_exist_ok=True)
    driver = os.path.join(src, "_parity_driver.py")
    with open(driver, "w") as f:
        f.write(REF_DRIVER)
    cfg = dict(model=model, path=os.path.join(workdir, "data"),
               clip_weight_path=os.path.join(workdir, "clip_weights.json"),
               seed=seed, epochs=epochs, early_stop=early_stop,
               lr=LR, l2=L2, batch=BATCH, emb=EMB, metrics=METRICS,
               history_max=HIST_MAX,
               model_path=os.path.join(workdir,
                                       f"ref_{model}_seed{seed}.pt"))
    r = subprocess.run([sys.executable, driver, json.dumps(cfg)],
                       cwd=src, capture_output=True, text=True,
                       timeout=timeout)
    for line in r.stdout.splitlines():
        if line.startswith("REF_RESULT "):
            return json.loads(line[len("REF_RESULT "):])
    raise RuntimeError(f"reference run failed rc={r.returncode}\n"
                       f"stdout tail: {r.stdout[-3000:]}\n"
                       f"stderr tail: {r.stderr[-3000:]}")


def run_ours(workdir, model, seed, epochs, early_stop):
    from segmminterest_tpu.segrec.main import main as segrec_main

    argv = ["--model_name", model, "--model_mode", "CTR",
            "--path", os.path.join(workdir, "data"),
            "--dataset", "SegMM_CTR", "--random_seed", str(seed),
            "--epoch", str(epochs), "--early_stop", str(early_stop),
            "--lr", str(LR), "--l2", str(L2),
            "--batch_size", str(BATCH), "--eval_batch_size", str(BATCH),
            "--metric", METRICS, "--duration_mask", "1",
            "--emb_size", str(EMB),
            "--clip_weight_path", os.path.join(workdir,
                                               "clip_weights.json"),
            "--history_max", str(HIST_MAX),
            "--layers", "[64]", "--att_layers", "[64]",
            "--dnn_layers", "[64]"]
    return segrec_main(argv)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["ClipWDRec", "ClipDINRec"],
                   default="ClipWDRec")
    p.add_argument("--seeds", default="1,2,3")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--early_stop", type=int, default=5)
    p.add_argument("--workdir", default="/tmp/segrec_parity")
    p.add_argument("--side", choices=["both", "ref", "ours"], default="both")
    p.add_argument("--out", default="")
    p.add_argument("--ref_timeout", type=int, default=14400)
    args = p.parse_args()

    import jax
    # unconditional: never touch the axon backend from a CPU parity tool
    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    build_dataset(args.workdir)
    out_path = args.out or os.path.join(
        args.workdir, f"parity_{args.model}.json")

    results = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    done = {(r["seed"], r["side"]) for r in results}

    for seed_s in args.seeds.split(","):
        seed = int(seed_s)
        if args.side in ("both", "ref") and (seed, "ref") not in done:
            print(f"=== reference {args.model} seed {seed} ===", flush=True)
            ref = run_reference(args.workdir, args.model, seed,
                                args.epochs, args.early_stop,
                                args.ref_timeout)
            results.append({"model": args.model, "seed": seed, "side": "ref",
                            **ref})
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
            print(json.dumps(ref, indent=2), flush=True)
        if args.side in ("both", "ours") and (seed, "ours") not in done:
            print(f"=== ours {args.model} seed {seed} ===", flush=True)
            ours = run_ours(args.workdir, args.model, seed,
                            args.epochs, args.early_stop)
            results.append({"model": args.model, "seed": seed,
                            "side": "ours", **ours})
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)

    # aggregate
    for side in ("ref", "ours"):
        rows = [r["test"] for r in results
                if r["side"] == side and r["model"] == args.model]
        if rows:
            keys = sorted(rows[0])
            mean = {k: float(np.mean([r[k] for r in rows])) for k in keys}
            print(f"{side:>5} test mean over {len(rows)} seeds: " +
                  " ".join(f"{k}={mean[k]:.4f}" for k in keys))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
