"""MMRec cross-implementation parity experiment (VERDICT r1 item 8).

Quantifies the TPU fixed-shape analogues logged as PARITY S6 (FREEDOM static
keep-mask vs per-epoch edge re-sampling) and S8 (LATTICE frozen kNN edges vs
per-epoch graph rebuild) by training the REFERENCE MMRec fork (torch, CPU;
/root/reference/SkipPredBaseline/MMRec/src) and the rebuild
(segmminterest_tpu.mmrec) on the identical sample-csv-derived dataset with
identical features and hyperparameters, then comparing best-test-upon-valid
HR@5/NDCG@5.

The reference source is copied to a scratch dir at runtime (it must run from
its own src/ layout with cwd-relative side files); nothing of it enters the
repo — only the measured numbers go into PARITY.md.

Usage:
  python tools/mmrec_ref_parity.py --model FREEDOM --epochs 30
  python tools/mmrec_ref_parity.py --model LATTICE --epochs 30
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
REF_SRC = "/root/reference/SkipPredBaseline/MMRec/src"
SAMPLE_CSV = "/root/reference/SegMM_inter_sample.csv"

sys.path.insert(0, REPO)

# identical hyperparameters on both sides (scalars picked from the reference
# grids: FREEDOM.yaml / LATTICE.yaml)
HYPERS = {
    "FREEDOM": dict(learning_rate=1e-3, reg_weight=0.0, dropout=0.1,
                    n_mm_layers=1, knn_k=10),
    "LATTICE": dict(learning_rate=1e-3, reg_weight=0.0, knn_k=10),
}


def build_dataset(workdir: str, seed: int = 2024, video_mod: int = 1,
                  min_interactions: int = 30, num_warmup: int = 10):
    """Sample csv -> reference-format dataset + side jsons + shared feats.

    video_mod > 1 subsamples videos (video_id % mod == 0) to shrink the frame
    universe: the reference LATTICE rebuilds a dense n_items x n_items
    similarity matrix per epoch (lattice.py:141 build_sim), which is
    infeasible at the full 77k-frame universe on one CPU core."""
    import pandas as pd
    from segmminterest_tpu.mmrec.main import build_mmrec_data

    csv_path = SAMPLE_CSV
    if video_mod > 1:
        df = pd.read_csv(SAMPLE_CSV)
        df = df[df["video_id"] % video_mod == 0]
        csv_path = os.path.join(workdir, "subset.csv")
        os.makedirs(workdir, exist_ok=True)
        df.to_csv(csv_path, index=False)

    data = build_mmrec_data(csv_path, ",", min_interactions, num_warmup, seed)

    ds_dir = os.path.join(workdir, "data", "SegMMdefault")
    side_dir = os.path.join(workdir, "src", "data")
    os.makedirs(ds_dir, exist_ok=True)
    os.makedirs(side_dir, exist_ok=True)

    # .inter: train = every (user, watched-frame) edge; dev/test rows only
    # nominate which users get scored (the metric reads the side jsons)
    rows = ["userID\titemID\tx_label"]
    for u, i in zip(data["train_u"], data["train_i"]):
        rows.append(f"{u}\t{i}\t0")
    for label, split in ((1, "dev"), (2, "test")):
        for r in data[split]:
            first = data["frame_map"][str(r["photo_id"])][0]
            rows.append(f"{r['userID']}\t{first}\t{label}")
    # pin item_num (= max itemID + 1 in the reference) to the feature-row
    # count: trailing never-watched frames appear in no interaction row. An
    # extra dev row for an already-evaluated user changes no metric (the
    # evaluator reads the side jsons, not the .inter).
    rows.append(f"{data['dev'][0]['userID']}\t{data['n_items'] - 1}\t1")
    with open(os.path.join(ds_dir, "SegMMdefault.inter"), "w") as f:
        f.write("\n".join(rows) + "\n")

    feats = np.random.default_rng(0).normal(
        size=(data["n_items"], 64)).astype(np.float32)
    feat_path = os.path.join(ds_dir, "image_feat_pos.npy")
    np.save(feat_path, feats)

    def user_video(split):
        out: dict = {}
        for r in split:
            out.setdefault(str(r["userID"]), {})[str(r["photo_id"])] = {
                "view_length": int(r["view_length"]),
                "duration": int(min(r["duration"], 40))}
        return out

    with open(os.path.join(side_dir,
                           "photo_id2frame_id_leave_SegMM.json"), "w") as f:
        json.dump(data["frame_map"], f)
    with open(os.path.join(side_dir,
                           "evaluate_dev_User_Video_SegMM.json"), "w") as f:
        json.dump(user_video(data["dev"]), f)
    with open(os.path.join(side_dir,
                           "evaluate_test_User_Video_SegMM.json"), "w") as f:
        json.dump(user_video(data["test"]), f)
    cold = [r for r in data["test"]
            if r["photo_id"] not in data["train_photos"]]
    with open(os.path.join(
            side_dir, "save_evaluate_all_User_Video_SegMM_coldTest.json"),
            "w") as f:
        json.dump(user_video(cold), f)
    return data, feat_path


REF_DRIVER = r"""
import json, sys, types
import torch

# torchvision/lmdb are absent in this image and only used by the reference's
# raw-image path (use_raw_features: False); satisfy the module-level imports
for name in ("torchvision", "torchvision.transforms",
             "torchvision.transforms.functional", "lmdb"):
    mod = types.ModuleType(name)
    sys.modules.setdefault(name, mod)
sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
sys.modules["torchvision.transforms"].functional = \
    sys.modules["torchvision.transforms.functional"]
sys.modules["torchvision.transforms.functional"].pad = None
sys.modules["torchvision.transforms.functional"].resize = None

# the reference targets an older scipy whose dok_matrix still had _update
from scipy.sparse import dok_matrix
if not hasattr(dok_matrix, "_update"):
    def _dok_update(self, data):
        for k, v in data.items():
            self[k] = v
    dok_matrix._update = _dok_update

model_name, epochs, stopping, hyper_json, seed = sys.argv[1:6]
hypers = json.loads(hyper_json)

from utils.configurator import Config
from utils.dataset import RecDataset
from utils.dataloader import TrainDataLoader, EvalDataLoader
from utils.logger import init_logger
from utils.utils import init_seed, get_model, get_trainer

config_dict = {"gpu_id": "0", "use_gpu": False, "save_logits": 0,
               "test_cold": 0, "epochs": int(epochs),
               "stopping_step": int(stopping), "end2end": False}
config_dict.update(hypers)
config = Config(model_name, "SegMMdefault", config_dict, False)
for k, v in config_dict.items():
    config[k] = v
config["device"] = torch.device("cpu")
init_logger(config)
init_seed(int(seed))

dataset = RecDataset(config)
train_ds, valid_ds, test_ds = dataset.split()
# quick_start logs str(ds), which sets ds.inter_num as a side effect the
# dataloaders depend on
for ds in (train_ds, valid_ds, test_ds):
    str(ds)
train_data = TrainDataLoader(config, train_ds,
                             batch_size=config["train_batch_size"],
                             shuffle=True)
valid_data = EvalDataLoader(config, valid_ds, additional_dataset=train_ds,
                            batch_size=config["eval_batch_size"])
test_data = EvalDataLoader(config, test_ds, additional_dataset=train_ds,
                           batch_size=config["eval_batch_size"])
train_data.pretrain_setup()
model = get_model(config["model"])(config, train_data).to(config["device"])
trainer = get_trainer()(config, model, False)
best_valid_score, best_valid, best_test = trainer.fit(
    train_data, valid_data=valid_data, test_data=test_data, saved=False)
print("REF_RESULT " + json.dumps(
    {"valid": best_valid, "test": best_test}, default=float))
"""


def run_reference(workdir, model, epochs, stopping, seed=42):
    src = os.path.join(workdir, "src")
    if not os.path.exists(os.path.join(src, "main.py")):
        shutil.copytree(REF_SRC, src, dirs_exist_ok=True)
        # lattice.py hardcodes .cuda() for its kNN adjacency; keep it on the
        # CPU device this experiment runs on (scratch copy only)
        lat = os.path.join(src, "models", "lattice.py")
        with open(lat) as f:
            txt = f.read()
        with open(lat, "w") as f:
            f.write(txt.replace(".cuda()", ".cpu()"))
    os.makedirs(os.path.join(src, "log"), exist_ok=True)
    driver = os.path.join(src, "_parity_driver.py")
    with open(driver, "w") as f:
        f.write(REF_DRIVER)
    hypers = json.dumps(HYPERS[model])
    r = subprocess.run(
        [sys.executable, driver, model, str(epochs), str(stopping), hypers,
         str(seed)],
        cwd=src, capture_output=True, text=True, timeout=7200)
    for line in r.stdout.splitlines():
        if line.startswith("REF_RESULT "):
            return json.loads(line[len("REF_RESULT "):])
    raise RuntimeError(f"reference run failed rc={r.returncode}\n"
                       f"stdout tail: {r.stdout[-3000:]}\n"
                       f"stderr tail: {r.stderr[-3000:]}")


def degenerate_last_block_graph(feats, knn_k, batch=1024):
    """The reference get_knn_adj_mat_batch's ACTUAL output (freedom.py:103-119):
    only the last block's within-block kNN, with block-LOCAL indices."""
    import numpy as np
    n = feats.shape[0]
    start = (max(0, (n - 1) // batch)) * batch
    x = feats[start:]
    x = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    sim = x @ x.T
    k = min(knn_k, sim.shape[1])
    idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
    rows = np.repeat(np.arange(len(x), dtype=np.int32), k)
    cols = idx.reshape(-1).astype(np.int32)
    deg = np.bincount(rows, minlength=n).astype(np.float64) + 1e-7
    values = (deg[rows] ** -0.5) * (deg[cols] ** -0.5)
    edges = np.stack([rows, cols], 1)
    return edges, values.astype(np.float32)


def run_ours(model, feat_path, epochs, stopping, csv_path,
             min_interactions, num_warmup, degenerate_graph=False,
             seed=42):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from segmminterest_tpu.mmrec.main import main as mmrec_main

    if degenerate_graph:
        import numpy as np
        import segmminterest_tpu.mmrec.main as mm
        from segmminterest_tpu.mmrec import graph as g
        orig = g.knn_item_graph
        mm_orig = mm.knn_item_graph

        def patched(feats, knn_k, batch=1024):
            return degenerate_last_block_graph(np.asarray(feats), knn_k,
                                               batch)
        g.knn_item_graph = patched
        mm.knn_item_graph = patched
    h = HYPERS[model]
    argv = ["--model", model, "--inter_csv", csv_path,
            "--min_interactions", str(min_interactions),
            "--num_warmup", str(num_warmup),
            "--feat_npy", feat_path, "--emb_size", "64",
            "--knn_k", str(h["knn_k"]), "--epochs", str(epochs),
            "--stopping_step", str(stopping), "--lr",
            str(h["learning_rate"]), "--use_mask_eval", "0",
            "--seed", str(seed)]
    if model == "FREEDOM":
        argv += ["--edge_dropout", str(h["dropout"])]
    return mmrec_main(argv)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["FREEDOM", "LATTICE"],
                   default="FREEDOM")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--stopping_step", type=int, default=10)
    p.add_argument("--workdir", default="/tmp/mmrec_parity")
    p.add_argument("--side", choices=["both", "ref", "ours"], default="both")
    p.add_argument("--video_mod", type=int, default=1)
    p.add_argument("--ours_degenerate_graph", type=int, default=0,
                   help="FREEDOM only: give OUR side the reference's literal "
                        "buggy mm graph (last 1024-item block's kNN pattern "
                        "remapped to items 0..block-1 — freedom.py:103-119, "
                        "PARITY S5) to isolate how much of the FREEDOM gap "
                        "the degenerate graph explains")
    p.add_argument("--min_interactions", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_warmup", type=int, default=10)
    args = p.parse_args()

    data, feat_path = build_dataset(args.workdir, video_mod=args.video_mod,
                                    min_interactions=args.min_interactions,
                                    num_warmup=args.num_warmup)
    csv_path = (os.path.join(args.workdir, "subset.csv")
                if args.video_mod > 1 else SAMPLE_CSV)
    out = {"model": args.model, "epochs": args.epochs, "seed": args.seed,
           "n_items": int(data["n_items"]), "video_mod": args.video_mod}
    if args.side in ("both", "ref"):
        ref = run_reference(args.workdir, args.model, args.epochs,
                            args.stopping_step, seed=args.seed)
        out["reference_test"] = ref["test"]
        print("reference best-test-upon-valid:", ref["test"])
    if args.side in ("both", "ours"):
        ours = run_ours(args.model, feat_path, args.epochs,
                        args.stopping_step, csv_path,
                        args.min_interactions, args.num_warmup,
                        degenerate_graph=bool(args.ours_degenerate_graph),
                        seed=args.seed)
        out["ours_test"] = ours["best_test_upon_valid"]
        print("ours best-test-upon-valid:", ours["best_test_upon_valid"])
    print("PARITY_RESULT " + json.dumps(out, default=float))


if __name__ == "__main__":
    main()
