"""Interaction readers: CSV splits -> fixed-shape numpy tables + histories.

Behavioral spec:
 * /root/reference/MMinterest/utils/dataloader_SegMM.py:41-149
   (BaseReaderSeq_SegMM: per-split csv, merge-sort history positions,
   history_max truncation, dense second_map id remapping :207-210).
 * /root/reference/data_process/get_data_SegMM_public.py:119-162
   (per-user split: <100-interaction users dropped, first 80 interactions ->
   warm-up pool, remainder 81/9/10 via seeded train_test_split; dense 1-based
   id maps over the combined frame).

Unlike the reference (per-sample pandas row parsing inside DataLoader
workers — its true training bottleneck), everything here is pre-tensorized
once at load: labels land in an (N, 40) int array, histories in per-user
chronological arrays indexed by a per-row position. The hot path afterwards
is pure array slicing.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from .labels import MAX_SEGMENTS, construct_label_1d, pad_label, parse_label_1d

SPLIT_SEED = 2024  # get_data_SegMM_public.py:43
NUM_WARMUP = 80    # :121
MIN_INTERACTIONS = 100  # :129


@dataclass
class InteractionTable:
    """One split, fully tensorized."""
    user_raw: np.ndarray      # (N,) raw user ids
    video_raw: np.ndarray     # (N,) raw video ids
    time_ms: np.ndarray       # (N,)
    duration_ms: np.ndarray   # (N,)
    playing_time: np.ndarray  # (N,)
    labels: np.ndarray        # (N, MAX_SEGMENTS) int32, padded with -2
    user_idx: np.ndarray      # (N,) dense 1-based identity ids
    item_idx: np.ndarray      # (N,) dense 1-based identity ids
    position: np.ndarray      # (N,) index into the user's chronological seq

    def __len__(self) -> int:
        return len(self.user_raw)


def normalize_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Unify the SegMM / KuaiRand column dialects
    (dataloader_SegMM.py:73 'playing_time_x' vs dataloader_KuaiRand.py:73
    'play_time_ms_x'): photo_id -> video_id, play_time_ms -> playing_time,
    and strip the pandas merge suffixes the reference caches carry."""
    renames = {}
    for cand in ("photo_id",):
        if cand in df.columns and "video_id" not in df.columns:
            renames[cand] = "video_id"
    for cand in ("play_time_ms", "playing_time_x", "play_time_ms_x"):
        if cand in df.columns and "playing_time" not in df.columns:
            renames[cand] = "playing_time"
    return df.rename(columns=renames) if renames else df


def _labels_from_df(df: pd.DataFrame) -> np.ndarray:
    out = np.full((len(df), MAX_SEGMENTS), -2, dtype=np.int32)
    if "label_1D" in df.columns:
        for i, s in enumerate(df["label_1D"].to_numpy()):
            out[i] = pad_label(parse_label_1d(str(s)))
    else:
        dur = df["duration_ms"].to_numpy()
        play = df["playing_time"].to_numpy()
        for i in range(len(df)):
            out[i] = pad_label(construct_label_1d(dur[i], play[i]))
    return out


def split_interactions(df: pd.DataFrame, seed: int = SPLIT_SEED,
                       num_warmup: int = NUM_WARMUP,
                       min_interactions: int = MIN_INTERACTIONS
                       ) -> Dict[str, pd.DataFrame]:
    """Per-user warm-up/train/dev/test split (get_data_SegMM_public.py:119-149).

    Uses sklearn.train_test_split with the reference's seed so split
    membership matches the reference pipeline exactly.
    """
    from sklearn.model_selection import train_test_split

    df = df.sort_values(by=["user_id", "time_ms"])
    parts: Dict[str, List[pd.DataFrame]] = {k: [] for k in
                                            ("input", "train", "dev", "test")}
    for _, group in df.groupby("user_id"):
        if len(group) < min_interactions:
            continue
        parts["input"].append(group.iloc[:num_warmup])
        remaining = group.iloc[num_warmup:]
        train_valid, test = train_test_split(remaining, test_size=0.1,
                                             random_state=seed)
        if len(test) < 1:
            test = remaining.sample(n=1, random_state=seed)
            train_valid = remaining.drop(test.index)
        train, valid = train_test_split(train_valid, test_size=0.1,
                                        random_state=seed)
        if len(valid) < 1:
            valid = train_valid.sample(n=1, random_state=seed)
            train = train_valid.drop(valid.index)
        parts["train"].append(train)
        parts["dev"].append(valid)
        parts["test"].append(test)
    if not parts["train"]:
        n_users = df["user_id"].nunique()
        biggest = int(df.groupby("user_id").size().max()) if len(df) else 0
        raise ValueError(
            f"no user passed the min_interactions={min_interactions} filter "
            f"({n_users} users, largest has {biggest} interactions) — lower "
            "--min_interactions/--num_warmup for small datasets")
    return {k: (pd.concat(v, ignore_index=True) if v else pd.DataFrame())
            for k, v in parts.items()}


def dense_id_maps(dfs: List[pd.DataFrame],
                  user_col="user_id", item_col="video_id"
                  ) -> Tuple[Dict[int, int], Dict[int, int]]:
    """1-based dense maps over sorted unique raw ids
    (get_data_SegMM_public.py:151-162)."""
    all_df = pd.concat([d[[user_col, item_col]] for d in dfs if len(d)])
    uids = sorted(all_df[user_col].unique())
    iids = sorted(all_df[item_col].unique())
    user2id = {int(u): i for i, u in enumerate(uids, start=1)}
    item2id = {int(v): i for i, v in enumerate(iids, start=1)}
    return user2id, item2id


class SeqReader:
    """Loads {train,dev,test} interaction splits and builds user histories.

    Two construction modes:
      * ``SeqReader.from_dir(path)`` — pre-split ``{train,dev,test}.csv``
        (tab-separated, reference layout), optional ``user_input_dict.json``
        and ``second_map_{user,item}2id.json``.
      * ``SeqReader.from_single_csv(path)`` — a raw interaction csv (e.g. the
        published SegMM_inter_sample.csv); performs the reference per-user
        split and derives warm-up dict + id maps.
    """

    def __init__(self, split_dfs: Dict[str, pd.DataFrame],
                 user2id: Dict[int, int], item2id: Dict[int, int],
                 user_input_dict: Optional[Dict[str, List[str]]] = None,
                 history_max: int = 50,
                 warmup_df: Optional[pd.DataFrame] = None):
        self.history_max = history_max
        self.user2id = user2id
        self.item2id = item2id
        self.user_input_dict = user_input_dict or {}
        self.n_users = max(user2id.values()) if user2id else 0
        self.n_items = max(item2id.values()) if item2id else 0

        # ---- global chronological history (dataloader_SegMM.py:113-134) ----
        key_cols = ["user_id", "video_id", "time_ms", "playing_time"]
        all_df = pd.concat([split_dfs[k][key_cols] for k in
                            ("train", "dev", "test")], ignore_index=True)
        sort_df = all_df.sort_values(by=["time_ms", "user_id"],
                                     kind="mergesort").reset_index(drop=True)
        sort_df["position"] = sort_df.groupby("user_id").cumcount()

        self.user_his_items: Dict[int, np.ndarray] = {}
        self.user_his_playing: Dict[int, np.ndarray] = {}
        for uid, g in sort_df.groupby("user_id"):
            self.user_his_items[int(uid)] = g["video_id"].to_numpy()
            self.user_his_playing[int(uid)] = g["playing_time"].to_numpy()

        # positions merge back onto each split on (user, video, time)
        pos_df = sort_df[["user_id", "video_id", "time_ms", "position"]]

        self.tables: Dict[str, InteractionTable] = {}
        for key in ("train", "dev", "test"):
            df = split_dfs[key]
            if not len(df):
                self.tables[key] = InteractionTable(*[np.zeros(0)] * 5,
                                                    np.zeros((0, MAX_SEGMENTS),
                                                             np.int32),
                                                    np.zeros(0, np.int32),
                                                    np.zeros(0, np.int32),
                                                    np.zeros(0, np.int32))
                continue
            df = pd.merge(df, pos_df, how="left",
                          on=["user_id", "video_id", "time_ms"])
            # duplicate (u,v,t) rows merge ambiguously; keep first, like the
            # reference's left merge semantics
            df = df.drop_duplicates(
                subset=["user_id", "video_id", "time_ms"], keep="first"
            ).reset_index(drop=True)
            self.tables[key] = InteractionTable(
                user_raw=df["user_id"].to_numpy(np.int64),
                video_raw=df["video_id"].to_numpy(np.int64),
                time_ms=df["time_ms"].to_numpy(np.int64),
                duration_ms=df["duration_ms"].to_numpy(np.int64),
                playing_time=df["playing_time"].to_numpy(np.int64),
                labels=_labels_from_df(df),
                user_idx=np.asarray(
                    [self.user2id.get(int(u), 0) for u in df["user_id"]],
                    np.int32),
                item_idx=np.asarray(
                    [self.item2id.get(int(v), 0) for v in df["video_id"]],
                    np.int32),
                position=df["position"].fillna(0).to_numpy(np.int64),
            )

    # ------------------------------------------------------------------
    @classmethod
    def from_dir(cls, path: str, sep: str = "\t", history_max: int = 50,
                 dict_path: str = "user_input_dict.json") -> "SeqReader":
        split_dfs = {}
        for key in ("train", "dev", "test"):
            split_dfs[key] = normalize_columns(
                pd.read_csv(osp.join(path, key + ".csv"), sep=sep))
        user_input_dict = None
        p = osp.join(path, dict_path)
        if osp.exists(p):
            with open(p) as f:
                user_input_dict = json.load(f)
        u_map_p = osp.join(path, "second_map_user2id.json")
        i_map_p = osp.join(path, "second_map_item2id.json")
        if osp.exists(u_map_p) and osp.exists(i_map_p):
            with open(u_map_p) as f:
                user2id = {int(k): v for k, v in json.load(f).items()}
            with open(i_map_p) as f:
                item2id = {int(k): v for k, v in json.load(f).items()}
        else:
            user2id, item2id = dense_id_maps(list(split_dfs.values()))
        return cls(split_dfs, user2id, item2id, user_input_dict, history_max)

    @classmethod
    def from_single_csv(cls, path: str, sep: str = ",", history_max: int = 50,
                        min_interactions: int = MIN_INTERACTIONS,
                        num_warmup: int = NUM_WARMUP) -> "SeqReader":
        df = normalize_columns(pd.read_csv(path, sep=sep))
        parts = split_interactions(df, num_warmup=num_warmup,
                                   min_interactions=min_interactions)
        # warm-up dict: uid -> ["{photo}_{frame}" ...] over played segments
        # (get_data_SegMM_public.py:104-114)
        user_input_dict: Dict[str, List[str]] = {}
        warm = parts["input"]
        if len(warm):
            for uid, g in warm.groupby("user_id"):
                frames = []
                for _, row in g.iterrows():
                    playing = min(row["playing_time"], row["duration_ms"])
                    n = max(0, -(-int(playing) // 5000))
                    pid = str(int(row["video_id"]))
                    frames.extend(f"{pid}_{i}" for i in range(n))
                user_input_dict[str(int(uid))] = frames
        user2id, item2id = dense_id_maps(
            [parts[k] for k in ("input", "train", "dev", "test")])
        return cls({k: parts[k] for k in ("train", "dev", "test")},
                   user2id, item2id, user_input_dict, history_max,
                   warmup_df=parts["input"])

    # ------------------------------------------------------------------
    def history_slice(self, uid: int, position: int):
        """The (items, playing) history before this interaction, truncated to
        the last ``history_max`` entries (dataloader_SegMM.py:97-110)."""
        items = self.user_his_items.get(int(uid))
        if items is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        lo = max(0, int(position) - self.history_max)
        return (items[lo:int(position)],
                self.user_his_playing[int(uid)][lo:int(position)])
