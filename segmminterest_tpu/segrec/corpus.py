"""SegRec corpus readers.

Behavioral spec: /root/reference/SegRec/helpers/{BaseReader,SeqReader,
ContextReader,ContextSeqReader}.py:
 * BaseReader: {train,dev,test}.csv with columns user_id, item_id, time
   [, label][, neg_items list-string][, c_* situation columns];
   n_users/n_items = max id + 1; per-user clicked sets (train vs residual).
 * SeqReader: global (time, user) mergesort -> per-interaction position into
   the user's chronological sequence.
 * ContextReader: item_meta.csv / user_meta.csv with i_* / u_* features;
   ``i_duration`` converted to a segment count (utils.calculate_frame_ids);
   ``feature_max`` per feature for embedding sizes.
 * ContextSeqReader: history positions + (optionally) historical situations.

One class covers all four reader roles: sequence and context handling are
driven by what the csvs contain, and everything is pre-tensorized into numpy
(the reference re-parses list-strings per sample in DataLoader workers).
"""

from __future__ import annotations

import ast
import logging
import os.path as osp
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def _parse_list_column(series: pd.Series) -> np.ndarray:
    """ReChorus stores neg_items as a python-list string per row
    (utils.eval_list_columns)."""
    rows = [np.asarray(ast.literal_eval(s) if isinstance(s, str) else s,
                       dtype=np.int64)
            for s in series]
    lens = {len(r) for r in rows}
    if len(lens) == 1:
        return np.stack(rows)
    # ragged (shouldn't happen in the published datasets) -> pad with 0
    m = max(lens)
    out = np.zeros((len(rows), m), np.int64)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


def calculate_frame_ids(duration_ms: float) -> int:
    """Segment count from duration (SegRec/utils/utils.py:calculate_frame_ids)."""
    return len(range(0, int(duration_ms), 5000))


class Corpus:
    def __init__(self, path: str, dataset: str, sep: str = "\t",
                 include_item_features: bool = True,
                 include_user_features: bool = True,
                 include_situation_features: bool = True):
        self.prefix = path
        self.dataset = dataset
        self.sep = sep
        base = osp.join(path, dataset)

        self.data_df: Dict[str, pd.DataFrame] = {}
        self.neg_items: Dict[str, Optional[np.ndarray]] = {}
        for key in ("train", "dev", "test"):
            df = pd.read_csv(osp.join(base, key + ".csv"), sep=sep) \
                .reset_index(drop=True).sort_values(by=["user_id", "time"])
            df = df.reset_index(drop=True)
            self.neg_items[key] = (_parse_list_column(df["neg_items"])
                                   if "neg_items" in df.columns else None)
            self.data_df[key] = df

        key_columns = ["user_id", "item_id", "time"]
        self.has_label = "label" in self.data_df["train"].columns
        if self.has_label:
            key_columns.append("label")
        self.all_df = pd.concat([self.data_df[k][key_columns]
                                 for k in ("train", "dev", "test")])
        self.n_users = int(self.all_df["user_id"].max()) + 1
        max_item = int(self.all_df["item_id"].max())
        # frame-as-item datasets can carry candidate/meta ids that never
        # appear as interaction targets (leave frames nobody watched)
        for key in ("dev", "test"):
            if self.neg_items[key] is not None and len(self.neg_items[key]):
                max_item = max(max_item, int(self.neg_items[key].max()))
        self.n_items = max_item + 1
        logger.info('"# user": %d, "# item": %d, "# entry": %d',
                    self.n_users - 1, self.n_items - 1, len(self.all_df))

        # clicked sets (BaseReader:30-41)
        self.train_clicked_set: Dict[int, set] = {}
        self.residual_clicked_set: Dict[int, set] = {}
        for key in ("train", "dev", "test"):
            df = self.data_df[key]
            for uid, iid in zip(df["user_id"], df["item_id"]):
                self.train_clicked_set.setdefault(uid, set())
                self.residual_clicked_set.setdefault(uid, set())
                if key == "train":
                    self.train_clicked_set[uid].add(iid)
                else:
                    self.residual_clicked_set[uid].add(iid)

        # ---- context features (ContextReader) ----
        self.situation_feature_names: List[str] = sorted(
            c for c in self.data_df["train"].columns if c[:2] == "c_"
        ) if include_situation_features else []
        self.item_feature_names: List[str] = []
        self.user_feature_names: List[str] = []
        self.item_features_arr: Dict[str, np.ndarray] = {}
        self.user_features_arr: Dict[str, np.ndarray] = {}
        self.feature_max: Dict[str, int] = {
            "user_id": self.n_users, "item_id": self.n_items}

        item_meta_path = osp.join(base, "item_meta.csv")
        if include_item_features and osp.exists(item_meta_path):
            meta = pd.read_csv(item_meta_path, sep=sep)
            self.item_feature_names = sorted(
                c for c in meta.columns if c[:2] == "i_")
            if "i_duration" in meta.columns:
                meta["i_duration"] = meta["i_duration"].apply(
                    calculate_frame_ids)
            # dense per-item lookup arrays indexed by item_id
            self.n_items = max(self.n_items,
                               int(meta["item_id"].max()) + 1)
            self.feature_max["item_id"] = self.n_items
            for f in self.item_feature_names:
                arr = np.zeros(self.n_items, np.float64)
                arr[meta["item_id"].to_numpy()] = meta[f].to_numpy()
                self.item_features_arr[f] = arr
                self.feature_max[f] = int(arr.max()) + 1
        user_meta_path = osp.join(base, "user_meta.csv")
        if include_user_features and osp.exists(user_meta_path):
            meta = pd.read_csv(user_meta_path, sep=sep)
            self.user_feature_names = sorted(
                c for c in meta.columns if c[:2] == "u_")
            for f in self.user_feature_names:
                arr = np.zeros(self.n_users, np.float64)
                arr[meta["user_id"].to_numpy()] = meta[f].to_numpy()
                self.user_features_arr[f] = arr
                self.feature_max[f] = int(arr.max()) + 1
        for f in self.situation_feature_names:
            self.feature_max[f] = int(
                max(self.data_df[k][f].max() for k in
                    ("train", "dev", "test"))) + 1

        # ---- history (SeqReader._append_his_info) ----
        # concatenate all splits with their origin, sort by (time, user)
        # mergesort, cumcount within user, scatter positions back by origin —
        # exact even with duplicated (user, item, time) rows (the reference's
        # merge would cross-join those)
        frames = []
        for key in ("train", "dev", "test"):
            cols = ["user_id", "item_id", "time"] \
                + list(self.situation_feature_names)
            f = self.data_df[key][cols].copy()
            f["__phase"] = key
            f["__row"] = np.arange(len(f))
            frames.append(f)
        cat = pd.concat(frames, ignore_index=True)
        cat = cat.sort_values(by=["time", "user_id"], kind="mergesort")
        cat["position"] = cat.groupby("user_id").cumcount()
        self.user_his_items: Dict[int, np.ndarray] = {}
        self.user_his_times: Dict[int, np.ndarray] = {}
        # per-position situation values for add_historical_situations
        # (ContextSeqReader.py:18-42)
        self.user_his_situs: Dict[str, Dict[int, np.ndarray]] = {
            f: {} for f in self.situation_feature_names}
        for uid, g in cat.groupby("user_id"):
            self.user_his_items[int(uid)] = g["item_id"].to_numpy()
            self.user_his_times[int(uid)] = g["time"].to_numpy()
            for f in self.situation_feature_names:
                self.user_his_situs[f][int(uid)] = g[f].to_numpy()
        for key in ("train", "dev", "test"):
            pos = np.zeros(len(self.data_df[key]), np.int64)
            sel = cat[cat["__phase"] == key]
            pos[sel["__row"].to_numpy()] = sel["position"].to_numpy()
            self.data_df[key] = self.data_df[key].assign(position=pos)

    def history_slice(self, uid: int, position: int, history_max: int):
        items = self.user_his_items.get(int(uid))
        if items is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        lo = max(0, int(position) - history_max) if history_max > 0 else 0
        return (items[lo:int(position)],
                self.user_his_times[int(uid)][lo:int(position)])
