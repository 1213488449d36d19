"""Knowledge-aware ReChorus family: CFKG, SLRCPlus, Chorus, KDA.

Rebuilds the reference's KG stack (SkipPredBaseline/ReChorus/src/...):
 * helpers/KGReader.py:31-73 — item_meta.csv r_* columns become
   (head, relation, tail) triplets (relation 0 reserved for the virtual
   buy/self relation); with include_attr the i_* attribute columns add
   attribute entities stacked after the items plus share_attr_dict.
 * helpers/KDAReader.py:26-106 — per-relation time-interval histograms,
   log2-normalized (norm_time :33-37), DFT'd (:26-31) into the initial
   frequency-domain decay representation freq_x.
 * models/general/CFKG.py — TransE scores over a joint user+entity graph,
   margin ranking loss over (pos, pos, neg-tail, neg-head) quadruples.
 * models/sequential/SLRCPlus.py — Hawkes base-intensity MF + per-relation
   excitation kernels (mixture of exponential + normal pdfs).
 * models/sequential/Chorus.py — stage 1 TransE pretrain over reversed
   relations, stage 2 relation-shifted item representations gated by
   relation-specific temporal kernels; KG params get a scaled lr (:179-196).
 * models/sequential/KDA.py — relational dynamic aggregation with inverse-DFT
   decay (:265-303), self-attention over the relation axis, DistMult KG task
   trained jointly (gamma-weighted, :178-190; sown here, added by the
   runner's sown-loss hook).

The reference cannot run this family on its own SegMM/KuaiRand exports
(no relation metadata — PARITY S14); build_segrec_data --kg_meta derives
`r_next_watch` (train-sequence successors) and `i_category` (duration
buckets) so the family is exercisable end-to-end here.
"""

from __future__ import annotations

import ast
import os.path as osp
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import flax.linen as nn

from .feeds import FeedBuilder
from .layers import dense, embed


# ---------------------------------------------------------------------------
# KG metadata (KGReader.py:31-73)
# ---------------------------------------------------------------------------

class KGMeta:
    def __init__(self, path: str, dataset: str, sep: str = "\t",
                 include_attr: bool = False, n_items: int = 0):
        meta_path = osp.join(path, dataset, "item_meta.csv")
        df = pd.read_csv(meta_path, sep=sep)
        for c in df.columns:
            if c.startswith("r_"):
                df[c] = df[c].apply(
                    lambda v: ast.literal_eval(v) if isinstance(v, str)
                    else ([] if pd.isna(v) else v))
        self.item_meta_df = df
        self.n_items = n_items

        self.item_relations = [c for c in df.columns if c.startswith("r_")]
        if not self.item_relations:
            raise ValueError(
                f"{meta_path} has no r_* relation columns; regenerate with "
                "build_segrec_data --kg_meta 1 (KGReader.py requires them)")
        self.triplet_set = set()
        heads, relations, tails = [], [], []
        for idx in range(len(df)):
            head_item = int(df["item_id"].values[idx])
            for r_idx, r in enumerate(self.item_relations):
                for tail_item in df[r].values[idx]:
                    heads.append(head_item)
                    tails.append(int(tail_item))
                    relations.append(r_idx + 1)  # 0 is the virtual relation
                    self.triplet_set.add((head_item, r_idx + 1,
                                          int(tail_item)))

        self.attr_relations: List[str] = []
        self.attr_max: List[int] = []
        self.share_attr_dict: Dict[int, list] = {}
        if include_attr:
            self.attr_relations = [c for c in df.columns
                                   if c.startswith("i_")]
            for r_idx, attr in enumerate(self.attr_relations):
                base = n_items + int(np.sum(self.attr_max))
                relation_idx = len(self.item_relations) + r_idx + 1
                for item, val in zip(df["item_id"], df[attr]):
                    if val != 0:
                        heads.append(int(item))
                        tails.append(int(val + base))
                        relations.append(relation_idx)
                        self.triplet_set.add(
                            (int(item), relation_idx, int(val + base)))
                for val, val_df in df.groupby(attr):
                    self.share_attr_dict[int(val + base)] = \
                        val_df["item_id"].tolist()
                self.attr_max.append(int(df[attr].max()) + 1)

        self.relations = self.item_relations + self.attr_relations
        self.relation_df = pd.DataFrame(
            {"head": heads, "relation": relations, "tail": tails})
        self.n_relations = len(self.relations) + 1
        self.n_entities = int(max(
            [n_items] + heads + tails)) + 1 if heads else n_items
        # head -> {(relation, tail)} for fast interval lookups
        self.head_index: Dict[int, set] = {}
        for h, r, t in self.triplet_set:
            self.head_index.setdefault(h, set()).add((r, t))


def norm_time(a, t_scalar: int) -> np.ndarray:
    """KDAReader.norm_time (:33-37)."""
    norm_t = np.log2(np.asarray(a, np.float64) / t_scalar + 1e-6)
    return np.maximum(norm_t, 0)


def kda_freq_init(corpus, kg: KGMeta, n_dft: int = 64,
                  t_scalar: int = 60):
    """KDAReader._time_interval_cnt + _cal_freq_x (:53-106): per-relation
    time-interval distributions, log-binned, DFT'd with folded negative
    frequencies. Returns (freq_x complex (R, n_dft//2+1), n_dft)."""
    interval_dict: Dict[str, list] = {"virtual": []}
    for rel in kg.relations:
        interval_dict[rel] = []

    meta_cols = ["item_id"] + kg.attr_relations
    merge_df = pd.merge(corpus.all_df, kg.item_meta_df[meta_cols],
                        how="left", on="item_id")
    for user, user_df in merge_df.groupby("user_id"):
        times = user_df["time"].values
        iids = user_df["item_id"].values
        interval_dict["virtual"].extend(
            [t for t in (times[1:] - times[:-1]) if t > 0])
        for attr in kg.attr_relations:
            for val, df in user_df.groupby(attr):
                dt = df["time"].values
                interval_dict[attr].extend(
                    [t for t in (dt[1:] - dt[:-1]) if t > 0])
        for r_idx, relation in enumerate(kg.item_relations):
            for target_idx in range(1, len(iids))[::-1]:
                target_i, target_t = iids[target_idx], times[target_idx]
                for source_idx in range(target_idx)[::-1]:
                    delta_t = target_t - times[source_idx]
                    if delta_t > 0 and (iids[source_idx], r_idx + 1,
                                        target_i) in kg.triplet_set:
                        interval_dict[relation].append(delta_t)
                        break

    distributions = []
    for col in ["virtual"] + kg.relations:
        intervals = norm_time(interval_dict[col] or [1], t_scalar)
        bin_num = int(max(intervals.max(), 0)) + 1
        ns = np.zeros(bin_num)
        for inter in intervals:
            ns[int(inter)] += 1
        distributions.append(ns / max(ns.max(), 1))
        min_dft = 2 ** (int(np.log2(bin_num) + 1))
        n_dft = max(n_dft, min_dft)
    freq_x = np.empty((kg.n_relations, n_dft // 2 + 1), dtype=complex)
    for i, dist in enumerate(distributions):
        fx = np.fft.fft(dist, n_dft)
        freq_x[i] = 2 * fx[: n_dft // 2 + 1]
    return freq_x, n_dft


# ---------------------------------------------------------------------------
# KG feed builder
# ---------------------------------------------------------------------------

class KGFeedBuilder(FeedBuilder):
    """Ranking feeds augmented with the per-model KG inputs.

    kg_mode:
     * 'cfkg'       — train phase yields (head, tail, relation) quadruple
       batches over relation_df + interactions (CFKG.py:78-129); eval is the
       standard ranking feed recast as (user buy item) triples in-model.
     * 'chorus_kg'  — Chorus stage-1 pretrain quadruples over the REVERSED
       relation_df (Chorus.py:212-221).
     * 'slrc'       — + relational_interval with the slot-0 repeat-consumption
       gap (SLRCPlus.py:91-116).
     * 'chorus'     — + relational_interval (no slot 0) + category_id
       (Chorus.py:222-242).
     * 'kda'        — + item_val entity values, normalized history_delta_t,
       and per-row DistMult quadruples resampled per epoch
       (KDA.py:192-262).
    """

    def __init__(self, corpus, phase, kg: KGMeta, kg_mode: str,
                 time_scalar: int = 60 * 60 * 24 * 100,
                 category_col: str = "i_category",
                 t_scalar: int = 60, num_neg_kg: int = 1,
                 neg_head_p: float = 0.5, **kwargs):
        super().__init__(corpus, phase, **kwargs)
        self.kg = kg
        self.kg_mode = kg_mode
        self.time_scalar = time_scalar
        self.t_scalar = t_scalar
        self.num_neg_kg = num_neg_kg
        self.neg_head_p = neg_head_p
        self.relation_num = len(kg.item_relations) + 1

        df = kg.item_meta_df
        if category_col in df.columns:
            self.item2cate = dict(zip(df["item_id"].astype(int),
                                      df[category_col].astype(int)))
            self.category_num = int(df[category_col].max()) + 1
        else:
            self.item2cate, self.category_num = None, 1

        # KDA item -> per-relation entity value (KDA.py:198-207)
        if kg_mode == "kda":
            item_val = df.copy()
            item_val[kg.item_relations] = 0
            for idx, r in enumerate(kg.attr_relations):
                base = kg.n_items + int(np.sum(kg.attr_max[:idx]))
                item_val[r] = item_val[r].astype(int) + base
            vals = item_val[kg.relations].values if kg.relations else \
                np.zeros((len(item_val), 0), int)
            self.item_val_dict = {
                int(i): [0] + list(map(int, v))
                for i, v in zip(item_val["item_id"].values, vals.tolist())}

        self._kg_train = (phase == "train"
                          and kg_mode in ("cfkg", "chorus_kg"))
        if self._kg_train:
            rel = kg.relation_df
            if kg_mode == "cfkg":
                inter = pd.DataFrame({
                    "head": self.user_id, "relation": 0,
                    "tail": self.item_id})
                self.kg_rows = pd.concat(
                    [rel, inter], axis=0).reset_index(drop=True)
            else:
                self.kg_rows = rel.reset_index(drop=True)
            self.neg_heads = np.zeros(len(self.kg_rows), int)
            self.neg_tails = np.zeros(len(self.kg_rows), int)

    # -- lengths ---------------------------------------------------------
    def __len__(self):
        if self._kg_train:
            return len(self.kg_rows)
        return super().__len__()

    # -- per-epoch sampling ---------------------------------------------
    def actions_before_epoch(self):
        if self._kg_train:
            self._sample_kg_negatives()
            return
        super().actions_before_epoch()
        if self.kg_mode == "kda" and self.phase == "train":
            self._sample_kda_kg()

    def _sample_kg_negatives(self):
        """CFKG.Dataset.actions_before_epoch (:114-129) / Chorus stage-1
        (:244-253): rejection-sample corrupted heads/tails."""
        kg, rng = self.kg, self.rng
        heads = self.kg_rows["head"].values
        tails = self.kg_rows["tail"].values
        rels = self.kg_rows["relation"].values
        n_items = self.corpus.n_items
        hi = n_items if self.kg_mode == "chorus_kg" else \
            (kg.n_entities if kg.attr_relations else n_items)
        for i in range(len(self.kg_rows)):
            self.neg_tails[i] = rng.integers(1, n_items)
            if self.kg_mode == "cfkg" and rels[i] == 0:
                self.neg_heads[i] = rng.integers(1, self.corpus.n_users)
                clicked = self.corpus.train_clicked_set
                while self.neg_tails[i] in clicked.get(heads[i], set()):
                    self.neg_tails[i] = rng.integers(1, n_items)
                while tails[i] in clicked.get(self.neg_heads[i], set()):
                    self.neg_heads[i] = rng.integers(1, self.corpus.n_users)
            else:
                self.neg_heads[i] = rng.integers(1, max(hi, 2))
                while (heads[i], rels[i], self.neg_tails[i]) \
                        in kg.triplet_set:
                    self.neg_tails[i] = rng.integers(1, max(hi, 2))
                while (self.neg_heads[i], rels[i], tails[i]) \
                        in kg.triplet_set:
                    self.neg_heads[i] = rng.integers(1, max(hi, 2))

    def _sample_kda_kg(self):
        """KDA.Dataset.generate_kg_data + neg sampling (:221-262)."""
        kg, rng = self.kg, self.rng
        n = super().__len__()
        replace = n > len(kg.relation_df)
        samp = kg.relation_df.sample(
            n=n, replace=replace,
            random_state=int(rng.integers(0, 2 ** 31 - 1))) \
            .reset_index(drop=True)
        vals = np.zeros(n, int)
        heads = samp["head"].values.copy()
        tails = samp["tail"].values.copy()
        rels = samp["relation"].values
        attr_sel = tails >= kg.n_items
        vals[attr_sel] = tails[attr_sel]
        for i in np.where(attr_sel)[0]:
            share = kg.share_attr_dict[int(tails[i])]
            tails[i] = share[rng.integers(len(share))]
        neg_heads = rng.integers(1, kg.n_items, size=(n, self.num_neg_kg))
        neg_tails = rng.integers(1, kg.n_items, size=(n, self.num_neg_kg))
        for i in range(n):
            item_item = tails[i] <= kg.n_items and not attr_sel[i]
            for j in range(self.num_neg_kg):
                if rng.random() < self.neg_head_p:
                    t = tails[i] if item_item else vals[i]
                    while (neg_heads[i][j], rels[i], t) in kg.triplet_set:
                        neg_heads[i][j] = rng.integers(1, kg.n_items)
                    neg_tails[i][j] = tails[i]
                else:
                    while True:
                        h = heads[i] if item_item else neg_tails[i][j]
                        t = neg_tails[i][j] if item_item else vals[i]
                        if (h, rels[i], t) not in kg.triplet_set:
                            break
                        neg_tails[i][j] = rng.integers(1, kg.n_items)
                    neg_heads[i][j] = heads[i]
        self._kda_kg = dict(head=heads, tail=tails, relation=rels,
                            value=vals, neg_heads=neg_heads,
                            neg_tails=neg_tails)

    # -- assembly --------------------------------------------------------
    def _kg_batch(self, idx, B):
        n_real = len(idx)

        def pad(a):
            if n_real == B:
                return a
            out = np.zeros((B,) + a.shape[1:], a.dtype)
            out[:n_real] = a
            return out

        heads = self.kg_rows["head"].values[idx]
        tails = self.kg_rows["tail"].values[idx]
        rels = self.kg_rows["relation"].values[idx]
        nh, nt = self.neg_heads[idx], self.neg_tails[idx]
        head_id = np.stack([heads, heads, heads, nh], 1)
        tail_id = np.stack([tails, tails, nt, tails], 1)
        if self.kg_mode == "chorus_kg":
            # reversed: the wanted relations are is_complement_of /
            # is_substitute_of (Chorus.py:219-221)
            head_id, tail_id = tail_id, head_id
        else:
            # CFKG entity indexing: users first, then entities (:98-109)
            head_id = np.where(rels[:, None] > 0,
                               head_id + self.corpus.n_users, head_id)
            tail_id = tail_id + self.corpus.n_users
        return {
            "head_id": pad(head_id.astype(np.int64)),
            "tail_id": pad(tail_id.astype(np.int64)),
            "relation_id": pad(np.repeat(rels[:, None], 4,
                                         1).astype(np.int64)),
            "row_mask": pad(np.ones(n_real, bool)),
        }

    def _relational_intervals(self, idx, items, with_repeat):
        """SLRCPlus.Dataset._get_feed_dict (:91-116) / Chorus (:230-239):
        backward scan of the history for the repeat gap (slot 0) and the
        most recent relationally-linked interaction per relation."""
        n, I = items.shape
        R = self.relation_num
        out = np.full((n, I, R), -1.0, np.float32)
        head_index = self.kg.head_index
        for r in range(n):
            row = idx[r]
            L = int(self.hist_len[row])
            hist = self.hist_items[row][:L]
            times = self.hist_times[row][:L]
            t = self.time[row]
            for c in range(I):
                tgt = int(items[r, c])
                for j in range(L - 1, -1, -1):
                    h = int(hist[j])
                    if with_repeat and out[r, c, 0] < 0 and h == tgt:
                        out[r, c, 0] = (t - times[j]) / self.time_scalar
                    linked = head_index.get(h)
                    if linked:
                        for r_idx in range(1, R):
                            if out[r, c, r_idx] < 0 \
                                    and (r_idx, tgt) in linked:
                                out[r, c, r_idx] = \
                                    (t - times[j]) / self.time_scalar
        return out

    def _assemble(self, idx, B):
        if self._kg_train:
            return self._kg_batch(idx, B)
        feed = super()._assemble(idx, B)
        n_real = len(idx)
        items = feed["item_id"][:n_real]

        def pad(a):
            if n_real == B:
                return a
            out = np.zeros((B,) + a.shape[1:], a.dtype)
            out[:n_real] = a
            return out

        if self.kg_mode == "slrc":
            feed["relational_interval"] = pad(
                self._relational_intervals(idx, items, with_repeat=True))
        elif self.kg_mode == "chorus":
            feed["relational_interval"] = pad(
                self._relational_intervals(idx, items, with_repeat=False))
            cate = (np.vectorize(lambda x: self.item2cate.get(int(x), 0))(
                items) if self.item2cate is not None
                else np.zeros_like(items))
            feed["category_id"] = pad(cate.astype(np.int64))
        elif self.kg_mode == "kda":
            vals = np.zeros((n_real, items.shape[1], self.kg.n_relations),
                            np.int64)
            for r in range(n_real):
                for c in range(items.shape[1]):
                    vals[r, c] = self.item_val_dict.get(
                        int(items[r, c]), [0] * self.kg.n_relations)
            feed["item_val"] = pad(vals)
            feed["history_delta_t"] = pad(norm_time(
                np.maximum(feed["history_delta_t"][:n_real], 0),
                self.t_scalar).astype(np.float32))
            if self.phase == "train":
                d = self._kda_kg
                feed["head_id"] = pad(np.concatenate(
                    [d["head"][idx, None], d["neg_heads"][idx]],
                    1).astype(np.int64))
                feed["tail_id"] = pad(np.concatenate(
                    [d["tail"][idx, None], d["neg_tails"][idx]],
                    1).astype(np.int64))
                feed["relation_id"] = pad(d["relation"][idx].astype(
                    np.int64))
                feed["value_id"] = pad(d["value"][idx].astype(np.int64))
        return feed


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------

def _norm_pdf(x, mu, sigma):
    return jnp.exp(-0.5 * ((x - mu) / sigma) ** 2) \
        / (sigma * np.sqrt(2 * np.pi))


def _exp_pdf(x, beta):
    return beta * jnp.exp(-beta * x)


class CFKGModel(nn.Module):
    """CFKG (general/CFKG.py:28-76): TransE over users+entities."""
    user_num: int
    entity_num: int
    relation_num: int
    emb_size: int = 64
    margin: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        e_emb = embed(self.user_num + self.entity_num, self.emb_size,
                      "e_embeddings", self.dtype)
        r_emb = embed(self.relation_num, self.emb_size, "r_embeddings",
                      self.dtype)
        if "head_id" in feed:
            head_ids = feed["head_id"].astype(jnp.int32)
            tail_ids = feed["tail_id"].astype(jnp.int32)
            rel_ids = feed["relation_id"].astype(jnp.int32)
        else:  # eval: (user, buy, item) with items shifted past users (:100-109)
            tail_ids = feed["item_id"].astype(jnp.int32) + self.user_num
            head_ids = jnp.broadcast_to(
                feed["user_id"].astype(jnp.int32)[:, None], tail_ids.shape)
            rel_ids = jnp.zeros_like(tail_ids)
        h = e_emb(head_ids)
        t = e_emb(tail_ids)
        r = r_emb(rel_ids)
        return -((h + r - t) ** 2).sum(-1)


def cfkg_margin_loss(predictions, row_mask, margin):
    """nn.MarginRankingLoss(margin)(pos, neg, 1) over the (B, 4) quadruple
    layout (CFKG.py:70-76): pos = cols 0:2, neg = cols 2:4."""
    pos = predictions[:, :2]
    neg = predictions[:, 2:4]
    per = jnp.maximum(0.0, -(pos - neg) + margin)
    rm = row_mask.astype(predictions.dtype)[:, None]
    return (per * rm).sum() / jnp.maximum(rm.sum() * 2.0, 1.0)


class SLRCPlusModel(nn.Module):
    """SLRC+ (sequential/SLRCPlus.py:28-89): MF base intensity + Hawkes
    excitation with per-(item, relation) kernel mixtures."""
    user_num: int
    item_num: int
    relation_num: int
    emb_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        i_ids = feed["item_id"].astype(jnp.int32)
        u_ids = feed["user_id"].astype(jnp.int32)
        r_int = feed["relational_interval"].astype(self.dtype)

        global_alpha = self.param("global_alpha", nn.initializers.zeros, ())
        alphas = global_alpha + embed(self.item_num, self.relation_num,
                                      "alphas", self.dtype)(i_ids)
        pis = embed(self.item_num, self.relation_num, "pis",
                    self.dtype)(i_ids) + 0.5
        mus = embed(self.item_num, self.relation_num, "mus",
                    self.dtype)(i_ids) + 1.0
        betas = jnp.clip(embed(self.item_num, self.relation_num, "betas",
                               self.dtype)(i_ids) + 1.0, 1e-10, 10.0)
        sigmas = jnp.clip(embed(self.item_num, self.relation_num, "sigmas",
                                self.dtype)(i_ids) + 1.0, 1e-10, 10.0)
        mask = (r_int >= 0).astype(self.dtype)
        delta_t = r_int * mask
        decay = pis * _exp_pdf(delta_t, betas) \
            + (1 - pis) * _norm_pdf(delta_t, mus, sigmas)
        excitation = (alphas * decay * mask).sum(-1)

        u_bias = embed(self.user_num, 1, "user_bias", self.dtype)(u_ids)
        i_bias = embed(self.item_num, 1, "item_bias", self.dtype)(
            i_ids)[..., 0]
        u_vec = embed(self.user_num, self.emb_size, "u_embeddings",
                      self.dtype)(u_ids)
        i_vec = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)(i_ids)
        base = (u_vec[:, None, :] * i_vec).sum(-1) + u_bias + i_bias
        return base + excitation


class ChorusModel(nn.Module):
    """Chorus (sequential/Chorus.py:26-177)."""
    user_num: int
    item_num: int
    relation_names: tuple     # item relation column names, in order
    category_num: int = 1
    emb_size: int = 64
    margin: float = 1.0
    stage: int = 2
    base_method: str = "BPR"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        R = len(self.relation_names) + 1
        # instantiate every parameterized module up-front so the stage-1 KG
        # pretrain batches initialize the FULL tree (torch defines all
        # params at __init__; flax is lazy — a kg-only init would leave
        # u_embeddings/betas/... missing for the dev rec_forward)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)
        r_emb = embed(R, self.emb_size, "r_embeddings", self.dtype)
        u_emb = embed(self.user_num, self.emb_size, "u_embeddings",
                      self.dtype)
        beta_emb = embed(self.category_num, R, "betas", self.dtype)
        sigma_emb = embed(self.category_num, R, "sigmas", self.dtype)
        mu_emb = embed(self.category_num, R, "mus", self.dtype)
        ub_emb = embed(self.user_num, 1, "user_bias", self.dtype)
        ib_emb = embed(self.item_num, 1, "item_bias", self.dtype)
        pred_dense = dense(1, "prediction", use_bias=False,
                           dtype=self.dtype)
        if self.is_initializing():
            zi = jnp.zeros((1,), jnp.int32)
            u_emb(zi), beta_emb(zi), sigma_emb(zi), mu_emb(zi)
            ub_emb(zi), ib_emb(zi)
            pred_dense(jnp.zeros((1, self.emb_size), self.dtype))
            i_emb(zi), r_emb(zi)
        if "head_id" in feed:  # stage-1 KG pretrain batch (TransE, :155-166)
            h = i_emb(feed["head_id"].astype(jnp.int32))
            t = i_emb(feed["tail_id"].astype(jnp.int32))
            r = r_emb(feed["relation_id"].astype(jnp.int32))
            return -((h + r - t) ** 2).sum(-1)

        u_ids = feed["user_id"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        c_ids = feed["category_id"].astype(jnp.int32)
        r_int = feed["relational_interval"].astype(self.dtype)

        u_vec = u_emb(u_ids)
        i_vec = i_emb(i_ids)
        betas = jnp.clip(beta_emb(c_ids) + 1.0, 1e-10, 10.0)
        sigmas = jnp.clip(sigma_emb(c_ids) + 1.0, 1e-10, 10.0)
        mus = mu_emb(c_ids) + 1.0
        mask = (r_int >= 0).astype(self.dtype)
        dt = r_int * mask

        # relation-specific kernels (:100-120)
        decays = []
        for r_idx in range(R):
            delta, beta = dt[:, :, r_idx], betas[:, :, r_idx]
            sigma, mu = sigmas[:, :, r_idx], mus[:, :, r_idx]
            name = self.relation_names[r_idx - 1] if r_idx > 0 else ""
            if r_idx > 0 and "complement" in name:
                decay = _norm_pdf(delta, 0.0, beta)
            elif r_idx > 0 and "substitute" in name:
                decay = -_norm_pdf(delta, 0.0, beta) \
                    + _norm_pdf(delta, mu, sigma)
            else:
                decay = _exp_pdf(delta, beta)
            decays.append(jnp.clip(decay, -1.0, 1.0))
        temporal_decay = jnp.stack(decays, 2) * mask

        r_vectors = r_emb(jnp.arange(R))
        ri = i_vec[:, :, None, :] + r_vectors[None, None, :, :]
        chorus_vec = i_vec + (temporal_decay[..., None] * ri).sum(2)

        if self.base_method.upper().strip() == "GMF":
            mf = u_vec[:, None, :] * chorus_vec
            return pred_dense(mf)[..., 0]
        u_bias = ub_emb(u_ids)
        i_bias = ib_emb(i_ids)[..., 0]
        return (u_vec[:, None, :] * chorus_vec).sum(-1) + u_bias + i_bias


class KDAModel(nn.Module):
    """KDA (sequential/KDA.py:24-190,265-303). The DistMult KG objective is
    computed in-forward on train feeds and sown pre-weighted by gamma; the
    runner's sown-loss hook adds it to the BPR rec loss."""
    user_num: int
    item_num: int
    entity_num: int
    relation_num: int
    freq_dim: int
    freq_real_init: Any = None    # np (R, freq_dim) or None for random
    freq_imag_init: Any = None
    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 1
    attention_size: int = 10
    pooling: str = "average"
    include_val: bool = True
    gamma: float = 1.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        E, R = self.emb_size, self.relation_num
        e_emb = embed(self.entity_num, E, "entity_embeddings", self.dtype)
        r_emb = embed(R, E, "relation_embeddings", self.dtype)

        def finit(arr):
            if arr is None:
                return nn.initializers.normal(0.01)
            a = np.asarray(arr, np.float32)
            return lambda key, shape, dtype=self.dtype: jnp.asarray(
                a, dtype)
        freq_real = self.param("freq_real", finit(self.freq_real_init),
                               (R, self.freq_dim), self.dtype)
        freq_imag = self.param("freq_imag", finit(self.freq_imag_init),
                               (R, self.freq_dim), self.dtype)

        u_ids = feed["user_id"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        v_ids = feed["item_val"].astype(jnp.int32)
        history = feed["history_item_id"].astype(jnp.int32)
        delta_t_n = feed["history_delta_t"].astype(self.dtype)

        u_vec = embed(self.user_num, E, "user_embeddings",
                      self.dtype)(u_ids)
        i_vec = e_emb(i_ids)
        v_vec = e_emb(v_ids)
        his_vec = e_emb(history)
        B, H = history.shape

        # relational dynamic aggregation (:287-303)
        r_vectors = r_emb(jnp.arange(R))
        if self.include_val:
            ri = (r_vectors[None, None] + v_vec) * i_vec[:, :, None, :]
        else:
            ri = r_vectors[None, None] * i_vec[:, :, None, :]
        attention = jnp.einsum("bhe,bire->bihr", his_vec, ri)
        attention = attention - attention.max()
        valid = (history > 0)[:, None, :, None]
        attention = jnp.where(valid, attention, -jnp.inf)
        attention = jax.nn.softmax(attention, axis=-2)
        attention = jnp.where(jnp.isnan(attention), 0.0, attention)

        # inverse-DFT decay (:276-285), conjugate-symmetric fold
        freqs = np.concatenate([np.linspace(0, 1, self.freq_dim) / 2.0,
                                -np.linspace(0, 1, self.freq_dim) / 2.0])
        x_real = jnp.concatenate([freq_real, freq_real], -1)
        x_imag = jnp.concatenate([freq_imag, -freq_imag], -1)
        w = 2.0 * np.pi * jnp.asarray(freqs, self.dtype) \
            * delta_t_n[..., None]                      # B*H*2F
        real_part = jnp.cos(w)[:, :, None, :] * x_real[None, None]
        imag_part = jnp.sin(w)[:, :, None, :] * x_imag[None, None]
        decay = (real_part - imag_part).mean(-1) / 2.0  # B*H*R
        decay = jnp.clip(decay, 0, 1)[:, None] * valid.astype(self.dtype)
        attention = attention * decay
        context = jnp.einsum("bhe,bihr->bire", his_vec, attention)

        # self-attention over the relation axis (:128-137)
        I = i_ids.shape[1]
        x = context.reshape(B * I, R, E)
        drop = nn.Dropout(self.dropout)
        for layer in range(self.num_layers):
            residual = x
            dk = E // self.num_heads
            q = dense(E, f"attn_q_{layer}", use_bias=False,
                      dtype=self.dtype)(x)
            k = dense(E, f"attn_k_{layer}", use_bias=False,
                      dtype=self.dtype)(x)
            v = dense(E, f"attn_v_{layer}", use_bias=False,
                      dtype=self.dtype)(x)

            def split(t):
                return t.reshape(B * I, R, self.num_heads, dk) \
                    .transpose(0, 2, 1, 3)
            probs = jax.nn.softmax(
                (split(q) @ split(k).transpose(0, 1, 3, 2))
                / np.sqrt(dk), axis=-1)
            ctx = (probs @ split(v)).transpose(0, 2, 1, 3) \
                .reshape(B * I, R, E)
            ctx = dense(E, f"W2_{layer}", dtype=self.dtype)(
                nn.relu(dense(E, f"W1_{layer}", dtype=self.dtype)(ctx)))
            ctx = drop(ctx, deterministic=deterministic)
            x = nn.LayerNorm(dtype=self.dtype,
                             name=f"layer_norm_{layer}")(residual + ctx)
        context = x.reshape(B, I, R, E)

        # pooling (:142-150)
        if self.pooling == "attention":
            query = context * u_vec[:, None, None, :]
            att = dense(1, "A_out", use_bias=False, dtype=self.dtype)(
                jnp.tanh(dense(self.attention_size, "A",
                               dtype=self.dtype)(query)))[..., 0]
            att = jax.nn.softmax(att - att.max(), axis=-1)
            his_vector = (context * att[..., None]).sum(-2)
        elif self.pooling == "max":
            his_vector = context.max(-2)
        else:
            his_vector = context.mean(-2)

        i_bias = embed(self.item_num, 1, "item_bias", self.dtype)(
            i_ids)[..., 0]
        prediction = ((u_vec[:, None, :] + his_vector) * i_vec).sum(-1) \
            + i_bias

        if "head_id" in feed:   # train: joint DistMult objective (:160-190)
            h = e_emb(feed["head_id"].astype(jnp.int32))
            t = e_emb(feed["tail_id"].astype(jnp.int32))
            val = e_emb(feed["value_id"].astype(jnp.int32))
            rel = r_emb(feed["relation_id"].astype(jnp.int32))
            rv = (rel + val) if self.include_val else rel
            kg_pred = (h * rv[:, None, :] * t).sum(-1)
            pos, neg = kg_pred[:, 0], kg_pred[:, 1:]
            neg_softmax = jax.nn.softmax(neg, axis=1)
            rm = feed["row_mask"].astype(self.dtype)
            s = (jax.nn.sigmoid(pos[:, None] - neg) * neg_softmax).sum(1)
            kg_loss = -(jnp.log(jnp.clip(s, 1e-8, 1 - 1e-8)) * rm).sum() \
                / jnp.maximum(rm.sum(), 1)
            self.sow("losses", "kda_kg", self.gamma * kg_loss)
        return prediction


KG_MODELS = {"CFKG", "SLRCPlus", "Chorus", "KDA"}


def make_chorus_runner(model, cfg, lr_scale: float, mesh=None):
    """Chorus stage-2 runner: pretrained KG parameters (i_embeddings,
    r_embeddings) optimized with a scaled lr, biases without weight decay
    (Chorus.customize_parameters :179-196)."""
    import optax

    from .runner import RankingRunner

    class _ChorusRunner(RankingRunner):
        def _build_optimizer(self):
            c = self.cfg

            def label(params):
                def lab(path, _):
                    keys = [str(getattr(pp, "key", pp)) for pp in path]
                    if any("bias" in k for k in keys):
                        return "bias"
                    if any(k in ("i_embeddings", "r_embeddings")
                           for k in keys):
                        return "kg"
                    return "main"
                return jax.tree_util.tree_map_with_path(lab, params)

            def adam(lr, decay):
                if decay > 0:
                    return optax.chain(
                        optax.add_decayed_weights(decay), optax.adam(lr))
                return optax.adam(lr)

            return optax.multi_transform(
                {"main": adam(c.lr, c.l2),
                 "kg": adam(c.lr * lr_scale, c.l2),
                 "bias": optax.adam(c.lr)}, label)

    return _ChorusRunner(model, cfg, mesh=mesh)
