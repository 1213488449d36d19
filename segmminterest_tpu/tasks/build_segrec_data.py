"""Build SegRec (Task-2) datasets from raw segment-interaction csvs.

Behavioral spec: /root/reference/data_process/KuaiRand.py:36-60+ (bucket CTR
labels: per duration-bucket median view-ratio threshold) and the ReChorus
dataset layout consumed by /root/reference/SegRec/helpers/BaseReader.py
({train,dev,test}.csv with user_id, item_id, time[, label][, neg_items] +
item_meta.csv with i_* features).

Produces:
  <out>/<name>_CTR/{train,dev,test}.csv + item_meta.csv   (CTR task)
  <out>/<name>/{train,dev,test}.csv + item_meta.csv       (ranking task,
        dev/test rows carry sampled neg_items)

  python -m segmminterest_tpu.tasks.build_segrec_data \
      --inter_csv /root/reference/SegMM_inter_sample.csv \
      --out data --name SegMM --min_interactions 30 --num_warmup 10
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
import pandas as pd

from ..data.reader import normalize_columns, split_interactions


def bucket_ctr_labels(df: pd.DataFrame, n_buckets: int = 10) -> np.ndarray:
    """label = view_ratio > median(view_ratio of same duration bucket)
    (data_process/KuaiRand.py bucket_label)."""
    ratio = (df["playing_time"] / df["duration_ms"]).clip(upper=1.0)
    buckets = pd.qcut(df["duration_ms"], q=n_buckets, duplicates="drop")
    medians = ratio.groupby(buckets, observed=True).transform("median")
    return (ratio > medians).astype(int).to_numpy()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inter_csv", type=str, required=True)
    p.add_argument("--sep", type=str, default=",")
    p.add_argument("--out", type=str, default="data")
    p.add_argument("--name", type=str, default="SegMM")
    p.add_argument("--min_interactions", type=int, default=100)
    p.add_argument("--num_warmup", type=int, default=80)
    p.add_argument("--n_eval_neg", type=int, default=99)
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--kg_meta", type=int, default=0,
                   help="derive KG relation columns for the knowledge-aware "
                        "family (KGReader.py item_meta contract): "
                        "r_next_watch = train-sequence successor items, "
                        "i_category = 30s duration buckets")
    p.add_argument("--kg_max_tails", type=int, default=10)
    args = p.parse_args(argv)

    df = normalize_columns(pd.read_csv(args.inter_csv, sep=args.sep))
    parts = split_interactions(df, seed=args.seed,
                               num_warmup=args.num_warmup,
                               min_interactions=args.min_interactions)
    combined = pd.concat([parts[k] for k in ("train", "dev", "test")],
                         ignore_index=True)
    # dense 1-based ids like the reference second maps
    uids = {u: i for i, u in enumerate(sorted(combined["user_id"].unique()), 1)}
    iids = {v: i for i, v in enumerate(sorted(combined["video_id"].unique()), 1)}
    n_items = len(iids) + 1

    rng = np.random.default_rng(args.seed)
    # dense -> raw id maps for the Task-1 logit bridge
    # (SegRec/models/BaseModel.py:132-136 id2user/id2item)
    id2user = {str(v): str(k) for k, v in uids.items()}
    id2item = {str(v): str(k) for k, v in iids.items()}

    item_meta = combined.drop_duplicates("video_id")[
        ["video_id", "duration_ms"]].copy()
    item_meta["item_id"] = item_meta["video_id"].map(iids)
    item_meta = item_meta[["item_id", "duration_ms"]].rename(
        columns={"duration_ms": "i_duration"}).sort_values("item_id")
    item_meta_kg = item_meta
    if args.kg_meta:
        # r_next_watch: items that directly followed this item in some
        # user's TRAIN sequence (an also-view-style relation the SegMM
        # exports otherwise lack; KGReader.py:37-46 consumes r_* columns)
        succ = {}
        tr = parts["train"].sort_values(["user_id", "time_ms"],
                                        kind="mergesort")
        for _, grp in tr.groupby("user_id", sort=False):
            vids = grp["video_id"].map(iids).to_numpy()
            for a, b in zip(vids[:-1], vids[1:]):
                if a != b:
                    succ.setdefault(int(a), [])
                    if int(b) not in succ[int(a)]                             and len(succ[int(a)]) < args.kg_max_tails:
                        succ[int(a)].append(int(b))
        item_meta_kg = item_meta.copy()
        item_meta_kg["r_next_watch"] = [
            str(succ.get(int(i), [])) for i in item_meta_kg["item_id"]]
        item_meta_kg["i_category"] = (
            item_meta_kg["i_duration"] // 30000).clip(0, 9).astype(int) + 1

    for task in ("CTR", "ranking"):
        name = f"{args.name}_CTR" if task == "CTR" else args.name
        base = osp.join(args.out, name)
        os.makedirs(base, exist_ok=True)
        for key in ("train", "dev", "test"):
            part = parts[key].copy()
            out = pd.DataFrame({
                "user_id": part["user_id"].map(uids),
                "item_id": part["video_id"].map(iids),
                "time": part["time_ms"],
            })
            if task == "CTR":
                out["label"] = bucket_ctr_labels(part)
            elif key in ("dev", "test"):
                negs = rng.integers(1, n_items,
                                    size=(len(out), args.n_eval_neg))
                out["neg_items"] = [str(list(map(int, row))) for row in negs]
            out.to_csv(osp.join(base, key + ".csv"), sep="\t", index=False)
        # KG relation columns only in the ranking export (the KG family's
        # home); CTR context models keep the original feature set
        meta_out = item_meta if task == "CTR" else item_meta_kg
        meta_out.to_csv(osp.join(base, "item_meta.csv"), sep="\t",
                        index=False)
        import json
        with open(osp.join(base, "id2user.json"), "w") as f:
            json.dump(id2user, f)
        with open(osp.join(base, "id2item.json"), "w") as f:
            json.dump(id2item, f)
        print(f"wrote {base} ({ {k: len(parts[k]) for k in ('train','dev','test')} })")


if __name__ == "__main__":
    main()
