"""Impression-list reranking: reader, runner, base rankers, reranker zoo.

Rebuilds the reference's impression stack
(SkipPredBaseline/ReChorus/src/...):
 * helpers/ImpressionReader.py:27-129 — group consecutive (user, time) rows
   into impressions with positive/negative item lists; drop groups without
   positives or without negatives.
 * helpers/ImpressionRunner.py:18-133 — listwise NDCG/MAP/HR over the padded
   [pos | neg] candidate axis with the eps tie-break that ranks positives
   BELOW equal-scoring negatives (:90-94) and a stable mergesort (:97).
 * models/BaseImpressionModel.py:44-128 — the listwise loss zoo (implemented
   in .impression; the target protocol {1 pos, 0 neg, -1 pad} is :49 and the
   runner-side label construction ImpressionRunner.py:187-190).
 * models/BaseRerankerModel.py:15-133 — rerankers wrap a FROZEN pretrained
   base ranker whose scores/user-vector/item-vectors feed the reranker. The
   reference runs the ranker at collate time on the GPU (:73-84); here the
   ranker is a flax submodule evaluated INSIDE the jitted train/eval step
   (one fused executable, no host round-trip) with stop_gradient unless
   ``tuneranker``.
 * models/reranker/{PRM,SetRank,MIR}.py — the three rerankers.

TPU-first shape policy: every impression is padded to a fixed
[pos_len | neg_len] candidate axis and batches are padded by WRAPPING real
rows (row_mask marks the real ones) so the listwise losses — batch means,
like the reference's — never see degenerate all-pad rows (PARITY S16).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import dense, embed

NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# Impression data (ImpressionReader.py:27-129)
# ---------------------------------------------------------------------------

def build_impressions(corpus, phase: str, pos_len: int, neg_len: int,
                      history_max: int = 0) -> Dict[str, np.ndarray]:
    """Group the phase dataframe into fixed-shape impressions.

    Reference `_append_impression_info` (ImpressionReader.py:52-121): rows
    sharing (user_id, time) form one impression; positives are the label-1
    items, negatives the label-0 items; impressions lacking either side are
    dropped (:74-97 keep-mask + :121 neg_num>0 filter). Item lists are
    deduplicated (the reference goes through set()); lengths are clipped to
    pos_len/neg_len (BaseImpressionModel.Dataset:176-179).

    With ``history_max`` > 0 the per-user stream of POSITIVE interactions
    across all phases (time-ascending) supplies ``history_items`` /
    ``history_times`` of items strictly earlier than the impression time,
    and the NEGATIVE stream likewise supplies ``neg_history_items`` /
    ``neg_history_times`` / ``neg_lengths`` (ImpressionSeqReader.user_his
    pos/neg streams, ImpressionSeqReader.py:18-57 +
    BaseImpressionModel.py:237-253).
    """
    df = corpus.data_df[phase]
    if "label" not in df.columns:
        raise ValueError("impression data must have binary labels "
                         "(ImpressionReader.py:41) — use the *_CTR dataset")

    his_stream: Dict[int, list] = {}
    neg_his_stream: Dict[int, list] = {}
    if history_max > 0:
        import pandas as pd
        all_df = pd.concat([corpus.data_df[k][
            ["user_id", "item_id", "time", "label"]]
            for k in ("train", "dev", "test")])
        all_df = all_df.sort_values(by=["user_id", "time"], kind="mergesort")
        for positive, streams in ((True, his_stream),
                                  (False, neg_his_stream)):
            sel = all_df[(all_df["label"] == 1) == positive]
            for uid, grp in sel.groupby("user_id", sort=False):
                streams[int(uid)] = list(zip(grp["item_id"].to_numpy(),
                                             grp["time"].to_numpy()))

    users, times = [], []
    pos_items = []
    neg_items = []
    pos_num, neg_num = [], []
    for (uid, t), grp in df.groupby(["user_id", "time"], sort=False):
        import pandas as pd
        pos = pd.unique(grp.loc[grp["label"] == 1, "item_id"].to_numpy())
        neg = pd.unique(grp.loc[grp["label"] != 1, "item_id"].to_numpy())
        if len(pos) == 0 or len(neg) == 0:
            continue
        users.append(int(uid))
        times.append(int(t))
        p = np.zeros(pos_len, np.int32)
        p[:min(len(pos), pos_len)] = pos[:pos_len]
        n = np.zeros(neg_len, np.int32)
        n[:min(len(neg), neg_len)] = neg[:neg_len]
        pos_items.append(p)
        neg_items.append(n)
        pos_num.append(min(len(pos), pos_len))
        neg_num.append(min(len(neg), neg_len))

    R = len(users)
    data = {
        "user_id": np.asarray(users, np.int32),
        "time": np.asarray(times, np.int64),
        "item_id": np.concatenate(
            [np.stack(pos_items) if R else np.zeros((0, pos_len), np.int32),
             np.stack(neg_items) if R else np.zeros((0, neg_len), np.int32)],
            axis=1),
        "pos_num": np.asarray(pos_num, np.int32),
        "neg_num": np.asarray(neg_num, np.int32),
    }
    if history_max > 0:
        for prefix, streams in (("", his_stream), ("neg_", neg_his_stream)):
            his = np.zeros((R, history_max), np.int32)
            his_t = np.zeros((R, history_max), np.int64)
            lengths = np.zeros(R, np.int32)
            for i in range(R):
                stream = streams.get(data["user_id"][i], [])
                prior = [(it, tt) for it, tt in stream
                         if tt < data["time"][i]]
                prior = prior[-history_max:]
                lengths[i] = len(prior)
                for j, (it, tt) in enumerate(prior):
                    his[i, j] = it
                    his_t[i, j] = tt
            data[f"{prefix}history_items"] = his
            data[f"{prefix}history_times"] = his_t
            data[f"{prefix}lengths"] = lengths
    return data


def impression_targets(pos_num: np.ndarray, neg_num: np.ndarray,
                       pos_len: int, neg_len: int) -> np.ndarray:
    """{1 pos, 0 neg, -1 pad} labels (ImpressionRunner.py:187-190)."""
    pos = 2 * (np.arange(pos_len)[None, :] < pos_num[:, None]).astype(
        np.int32) - 1
    neg = (np.arange(neg_len)[None, :] < neg_num[:, None]).astype(
        np.int32) - 1
    return np.concatenate([pos, neg], axis=1)


class ImpressionFeedBuilder:
    """Fixed-shape impression batches; final batch wrap-pads real rows."""

    def __init__(self, corpus, phase: str, pos_len: int = 20,
                 neg_len: int = 20, history_max: int = 0, seed: int = 0):
        self.corpus = corpus
        self.phase = phase
        self.pos_len = pos_len
        self.neg_len = neg_len
        self.history_max = history_max
        self.data = build_impressions(corpus, phase, pos_len, neg_len,
                                      history_max)
        self.rng = np.random.default_rng(seed)
        self.task = "impression"

    def __len__(self):
        return len(self.data["user_id"])

    def actions_before_epoch(self):  # negatives are pre-defined (:199-211)
        pass

    def batches(self, batch_size: int,
                shuffle: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self)
        order = np.arange(n)
        if shuffle:
            self.rng.shuffle(order)
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            row_mask = np.ones(batch_size, bool)
            if len(idx) < batch_size:
                row_mask[len(idx):] = False
                extra = order[np.arange(batch_size - len(idx))
                              % max(n, 1)]
                idx = np.concatenate([idx, extra])
            feed = {k: v[idx] for k, v in self.data.items()}
            feed["target"] = impression_targets(
                feed["pos_num"], feed["neg_num"], self.pos_len, self.neg_len)
            feed["row_mask"] = row_mask
            yield feed


# ---------------------------------------------------------------------------
# Listwise metrics (ImpressionRunner.py:18-133)
# ---------------------------------------------------------------------------

def _hr_at_k(labels, valid_num, k):
    """ImpressionRunner.py:18-30."""
    ind = np.arange(labels.shape[1]) < valid_num[:, None]
    labels = labels * ind
    num_hits = labels[:, :k].sum(1)
    positive_num = labels.sum(1)
    positive_num[positive_num == 0] = 1
    positive_num[positive_num > k] = k
    hr = num_hits / positive_num
    hr[hr > 0] = 1
    return hr


def _dcg_at_k(labels, k):
    labels = labels[:, :k]
    return (labels / np.log2(np.arange(2, labels.shape[1] + 2))).sum(1)


def _ndcg_at_k(labels, valid_num, k):
    """ImpressionRunner.py:39-51."""
    ind = np.arange(labels.shape[1]) < valid_num[:, None]
    labels = labels * ind
    dcg = _dcg_at_k(labels, k)
    ideal = _dcg_at_k(np.sort(labels, axis=1)[:, ::-1], k)
    ideal[ideal == 0] = 1
    return dcg / ideal


def _ap_at_k(labels, valid_num, k):
    """ImpressionRunner.py:53-66."""
    ind = np.arange(labels.shape[1]) < valid_num[:, None]
    labels = labels * ind
    cum = np.cumsum(labels, axis=1).astype(np.float64)
    cum[:, k:] = 0
    precision = cum / np.arange(1, labels.shape[1] + 1)
    positive_num = labels.sum(1)
    positive_num[positive_num == 0] = 1
    positive_num[positive_num > k] = k
    return (precision * labels).sum(1) / positive_num


def evaluate_impressions(predictions: np.ndarray, pos_num: np.ndarray,
                         neg_num: np.ndarray, pos_len: int, topk,
                         metrics=("NDCG", "MAP", "HR")):
    """ImpressionRunner.evaluate_method (:74-133).

    ``predictions`` must already be -inf at padded candidate slots. The eps
    subtraction on the positive block makes equal-scoring positives rank
    BELOW negatives (:89-94); mergesort keeps the remaining order stable."""
    preds = predictions - 1e-6 * (np.arange(predictions.shape[1])[None, :]
                                  < pos_len)
    sort_idx = (-preds).argsort(axis=1, kind="mergesort")
    pos_cliped = np.minimum(pos_num, pos_len)
    neg_cliped = np.minimum(neg_num, predictions.shape[1] - pos_len)
    whole_len = pos_cliped + neg_cliped
    labels = (np.arange(pos_len)[None, :]
              < pos_cliped[:, None]).astype(int)
    pad = np.zeros((labels.shape[0], predictions.shape[1] - pos_len), int)
    labels = np.concatenate([labels, pad], axis=1)
    labels = np.take_along_axis(labels, sort_idx, axis=1)
    out = {}
    fns = {"NDCG": _ndcg_at_k, "MAP": _ap_at_k, "HR": _hr_at_k}
    for m in metrics:
        for k in topk:
            out[f"{m}@{k}"] = float(fns[m](labels, whole_len, k).mean())
    return out


# ---------------------------------------------------------------------------
# Base rankers ({BPRMF,SASRec}Impression: general/BPRMF.py:34-46,65-80 and
# sequential/SASRec.py forward over impression feeds)
# ---------------------------------------------------------------------------

class BPRMFImpressionRanker(nn.Module):
    """BPRMFBase.forward (general/BPRMF.py:34-46): dot-product scores,
    u_v = user vector broadcast per candidate, i_v = item vectors."""
    user_num: int
    item_num: int
    emb_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        u_emb = embed(self.user_num, self.emb_size, "u_embeddings",
                      self.dtype)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)
        u_v1 = u_emb(feed["user_id"].astype(jnp.int32))
        i_v = i_emb(feed["item_id"].astype(jnp.int32))
        scores = (u_v1[:, None, :] * i_v).sum(-1)
        u_v = jnp.broadcast_to(u_v1[:, None, :], i_v.shape)
        his_v = (i_emb(feed["history_items"].astype(jnp.int32))
                 if "history_items" in feed else None)
        return scores, u_v, i_v, his_v


class SASRecImpressionRanker(nn.Module):
    """SASRecImpression (sequential/SASRec.py:110-128): causal transformer
    over the positive history; u_v = the sequence vector broadcast."""
    user_num: int
    item_num: int
    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4
    history_max: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        from .models.sequential import _TransformerBlock
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)
        p_emb = embed(self.history_max + 1, self.emb_size, "p_embeddings",
                      self.dtype)
        his_ids = feed["history_items"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        B, L = his_ids.shape
        valid = jnp.arange(L)[None, :] < lengths[:, None]
        # position counts back from the sequence end (SASRec.py:59-62)
        position = (lengths[:, None] - jnp.arange(L)[None, :] - 1) * valid
        x = i_emb(his_ids) + p_emb(jnp.clip(position, 0, self.history_max))
        causal = jnp.tril(jnp.ones((L, L), bool))
        attn_mask = causal[None, None] & valid[:, None, None, :]
        for b in range(self.num_layers):
            x = _TransformerBlock(self.emb_size, self.emb_size,
                                  self.num_heads, 0.0, dtype=self.dtype,
                                  name=f"block_{b}")(
                x, attn_mask, deterministic=deterministic)
        x = x * valid[:, :, None]
        idx = jnp.clip(lengths - 1, 0, L - 1)
        his_vector = jnp.take_along_axis(
            x, idx[:, None, None].repeat(self.emb_size, 2), axis=1)[:, 0]
        i_v = i_emb(feed["item_id"].astype(jnp.int32))
        scores = (his_vector[:, None, :] * i_v).sum(-1)
        u_v = jnp.broadcast_to(his_vector[:, None, :], i_v.shape)
        return scores, u_v, i_v, i_emb(his_ids)


IMPRESSION_RANKERS = {
    "BPRMF": BPRMFImpressionRanker,
    "SASRec": SASRecImpressionRanker,
}


# ---------------------------------------------------------------------------
# Shared reranker plumbing (BaseRerankerModel.py:68-84 collate)
# ---------------------------------------------------------------------------

def _slot_valid(pos_num, neg_num, pos_len, cand_len):
    ar = jnp.arange(cand_len)[None, :]
    return jnp.where(ar < pos_len, ar < pos_num[:, None],
                     (ar - pos_len) < neg_num[:, None])


def _rank_positions(scores):
    """position = double argsort of descending scores (:80-81)."""
    order = jnp.argsort(-scores, axis=1)
    return jnp.argsort(order, axis=1)


class _MAB(nn.Module):
    """SetRank.py:29-56 MAB: torch-MHA (with out_proj) + post-LN FFN."""
    d_model: int
    n_heads: int
    d_ff: int = 128
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_pad, *, deterministic: bool = True):
        D, H = self.d_model, self.n_heads
        dk = D // H
        B, Lq, _ = q.shape
        Lk = k.shape[1]

        def split(t, L):
            return t.reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        qh = split(dense(D, "q_proj", dtype=self.dtype)(q), Lq)
        kh = split(dense(D, "k_proj", dtype=self.dtype)(k), Lk)
        vh = split(dense(D, "v_proj", dtype=self.dtype)(v), Lk)
        scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dk)
        if key_pad is not None:
            scores = jnp.where(key_pad[:, None, None, :], NEG_INF, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        ctx = (probs @ vh).transpose(0, 2, 1, 3).reshape(B, Lq, D)
        ctx = dense(D, "out_proj", dtype=self.dtype)(ctx)
        drop = nn.Dropout(self.dropout)
        x = nn.LayerNorm(name="norm1")(
            q + drop(ctx, deterministic=deterministic))
        ff = dense(D, "linear2", dtype=self.dtype)(
            drop(nn.relu(dense(self.d_ff, "linear1", dtype=self.dtype)(x)),
                 deterministic=deterministic))
        return nn.LayerNorm(name="norm2")(
            x + drop(ff, deterministic=deterministic))


class _RankerWrapper(nn.Module):
    """Evaluates the base ranker; gradients cut unless ``tuneranker``
    (BaseRerankerModel.py:64-66 requires_grad=False)."""
    ranker: nn.Module
    tuneranker: bool = False

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        out = self.ranker(feed, deterministic=deterministic)
        if not self.tuneranker:
            out = tuple(None if o is None else jax.lax.stop_gradient(o)
                        for o in out)
        return out


class PRMModel(nn.Module):
    """PRM (reranker/PRM.py:29-97): candidates + ranker PV vectors +
    ordinal position embedding (of the ranker-score rank) through
    transformer encoder blocks to a scalar score per slot."""
    item_num: int
    ranker: nn.Module
    ranker_emb_size: int
    pos_len: int = 20
    neg_len: int = 20
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64
    dropout: float = 0.0
    tuneranker: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        scores, u_v, i_v, _ = _RankerWrapper(self.ranker, self.tuneranker)(
            feed, deterministic=deterministic)
        C = self.pos_len + self.neg_len
        valid = _slot_valid(feed["pos_num"], feed["neg_num"],
                            self.pos_len, C)
        position = _rank_positions(jnp.where(valid, scores, NEG_INF))

        i_vec = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)(feed["item_id"].astype(jnp.int32))
        di = jnp.concatenate([i_vec, u_v, i_v], axis=2)
        pi = embed(C, self.emb_size + 2 * self.ranker_emb_size,
                   "ordinal_position_embedding", self.dtype)(position)
        # positionafter=0 (PRM.py:48,81-83): add position BEFORE rFF0
        x = dense(self.num_hidden_unit, "rFF0", dtype=self.dtype)(di + pi)
        key_pad = ~valid
        for b in range(self.n_blocks):
            x = _MAB(self.num_hidden_unit, self.num_heads, 128,
                     self.dropout, dtype=self.dtype, name=f"encoder_{b}")(
                x, x, x, key_pad, deterministic=deterministic)
        return dense(1, "rFF1", dtype=self.dtype)(x)[..., 0]


class SetRankModel(nn.Module):
    """SetRank (reranker/SetRank.py:82-156): MSAB or IMSAB blocks (induced
    set attention with 20 inducing points, :67-80); positionafter=1 adds the
    position embedding AFTER rFF0 (:104,143-145)."""
    item_num: int
    ranker: nn.Module
    ranker_emb_size: int
    pos_len: int = 20
    neg_len: int = 20
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64
    setrank_type: str = "IMSAB"
    m_clusters: int = 20
    dropout: float = 0.0
    tuneranker: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        scores, u_v, i_v, _ = _RankerWrapper(self.ranker, self.tuneranker)(
            feed, deterministic=deterministic)
        C = self.pos_len + self.neg_len
        valid = _slot_valid(feed["pos_num"], feed["neg_num"],
                            self.pos_len, C)
        position = _rank_positions(jnp.where(valid, scores, NEG_INF))

        i_vec = embed(self.item_num, self.emb_size, "i_embeddings",
                      self.dtype)(feed["item_id"].astype(jnp.int32))
        di = jnp.concatenate([i_vec, u_v, i_v], axis=2)
        x = dense(self.num_hidden_unit, "rFF0", dtype=self.dtype)(di)
        x = x + embed(C, self.num_hidden_unit, "ordinal_position_embedding",
                      self.dtype)(position)
        key_pad = ~valid
        B = x.shape[0]
        for b in range(self.n_blocks):
            if self.setrank_type == "MSAB":
                x = _MAB(self.num_hidden_unit, self.num_heads, 128,
                         self.dropout, dtype=self.dtype,
                         name=f"encoder_{b}")(
                    x, x, x, key_pad, deterministic=deterministic)
            else:  # IMSAB (SetRank.py:67-80)
                inducing = self.param(
                    f"I_{b}", nn.initializers.normal(0.01),
                    (self.m_clusters, self.num_hidden_unit), self.dtype)
                I_r = jnp.broadcast_to(inducing[None],
                                       (B, *inducing.shape))
                h = _MAB(self.num_hidden_unit, self.num_heads, 128,
                         self.dropout, dtype=self.dtype,
                         name=f"encoder_{b}_mab1")(
                    I_r, x, x, key_pad, deterministic=deterministic)
                x = _MAB(self.num_hidden_unit, self.num_heads, 128,
                         self.dropout, dtype=self.dtype,
                         name=f"encoder_{b}_mab2")(
                    x, h, h, None, deterministic=deterministic)
        return dense(1, "rFF1", dtype=self.dtype)(x)[..., 0]


class MIRModel(nn.Module):
    """MIR (reranker/MIR.py:19-180): intra-set attention over candidates,
    BiLSTM over the (positive) history, and set-to-list SLAttention with a
    learned per-user time-decay on the affinity matrix."""
    item_num: int
    ranker: nn.Module
    ranker_emb_size: int
    pos_len: int = 20
    neg_len: int = 20
    emb_size: int = 64
    num_heads: int = 4
    num_hidden_unit: int = 64
    dropout: float = 0.0
    tuneranker: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        scores, u_v, i_v_r, his_v_r = _RankerWrapper(
            self.ranker, self.tuneranker)(feed, deterministic=deterministic)
        C = self.pos_len + self.neg_len
        E, Er, H = self.emb_size, self.ranker_emb_size, self.num_hidden_unit
        valid = _slot_valid(feed["pos_num"], feed["neg_num"],
                            self.pos_len, C)

        i_emb = embed(self.item_num, E, "i_embeddings", self.dtype)
        i_v = jnp.concatenate(
            [i_emb(feed["item_id"].astype(jnp.int32)), i_v_r], axis=2)
        his_ids = feed["history_items"].astype(jnp.int32)
        his_v = jnp.concatenate([i_emb(his_ids), his_v_r], axis=2)
        seq_v = u_v[:, 0, :]

        # intra-set MHA over candidates (MIR.py:140-149); masked rows zeroed
        attn_i = _MAB(E + Er, self.num_heads, 128, self.dropout,
                      dtype=self.dtype, name="intra_set")(
            i_v, i_v, i_v, ~valid, deterministic=deterministic)
        attn_i = attn_i * valid[:, :, None]
        seq = jnp.concatenate([i_v, attn_i], axis=2)        # [B, C, 2(E+Er)]

        # intra-list BiLSTM over history (MIR.py:153-157)
        fwd = nn.RNN(nn.OptimizedLSTMCell(H), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(H), name="lstm_bwd",
                     reverse=True, keep_order=True)
        bilstm_his = jnp.concatenate([fwd(his_v), bwd(his_v)], axis=-1)
        usr_seq = jnp.concatenate([bilstm_his, his_v], axis=2)

        # time interval transform (MIR.py:161-167)
        ht = feed["history_times"].astype(jnp.float32)
        times = (ht > 0).astype(jnp.float32)
        tmax = jnp.max(ht, axis=1, keepdims=True) - ht
        tmax = jnp.log2(tmax + 1)
        tmax = tmax + jnp.max(tmax, axis=1, keepdims=True) + 1

        # SLAttention (MIR.py:19-79)
        v_dim, q_dim = 2 * (E + Er), (E + Er) + 2 * H
        w_b = self.param("w_b", nn.initializers.normal(0.01),
                         (q_dim, v_dim), self.dtype)
        w_v = self.param("w_v", nn.initializers.normal(0.01),
                         (v_dim, 1), self.dtype)
        w_q = self.param("w_q", nn.initializers.normal(0.01),
                         (q_dim, 1), self.dtype)
        c1 = jnp.einsum("blq,qv,bcv->blc", usr_seq, w_b, seq)
        theta = nn.leaky_relu(dense(1, "fc_decay2", dtype=self.dtype)(
            nn.leaky_relu(dense(32, "fc_decay1", dtype=self.dtype)(seq_v))))
        pos = (tmax * times)[:, :, None]
        decay = jnp.exp(-theta[:, :, None] * pos)
        c = jnp.tanh(c1 * decay + c1)
        hv_1 = jnp.broadcast_to((seq @ w_v), (seq.shape[0], C, C))
        hq_1 = jnp.broadcast_to((usr_seq @ w_q),
                                (seq.shape[0], usr_seq.shape[1], C)) \
            .transpose(0, 2, 1)                              # [B, C, L]
        h_v = jnp.tanh(hv_1 + hq_1 @ c)
        h_q = jnp.tanh(hq_1 + hv_1 @ c.transpose(0, 2, 1))
        v = jax.nn.softmax(h_v, axis=-1) @ seq
        q = jax.nn.softmax(h_q, axis=-1) @ usr_seq
        fin = jnp.concatenate([v, q], axis=2)

        final = jnp.concatenate([i_v, fin], axis=2)
        final = nn.LayerNorm(use_bias=False, use_scale=False,
                             name="ln")(final)
        drop = nn.Dropout(self.dropout)
        for units, name in ((500, "fc1"), (200, "fc2"), (80, "fc3")):
            final = drop(nn.relu(dense(units, name, dtype=self.dtype)(
                final)), deterministic=deterministic)
        return dense(1, "fc4", dtype=self.dtype)(final)[..., 0]


RERANKERS = {"PRM": PRMModel, "SetRank": SetRankModel, "MIR": MIRModel}


# ---------------------------------------------------------------------------
# Runner (ImpressionRunner.py:68-197)
# ---------------------------------------------------------------------------

class ImpressionRunner:
    """Listwise train/eval over impression feeds.

    Reuses RankingRunner's jitted-step/optimizer/early-stop machinery via
    composition-free subclassing (import below avoids a cycle); the loss is
    picked from IMPRESSION_LOSSES (ImpressionRunner.fit:173-197 builds the
    {1,0,-1} target and delegates to model.loss) and evaluation is
    evaluate_impressions."""

    def __new__(cls, *args, **kwargs):  # pragma: no cover - alias
        raise TypeError("use make_impression_runner()")


def make_impression_runner(model, cfg, pos_len: int, neg_len: int,
                           mesh=None):
    from .impression import IMPRESSION_LOSSES
    from .runner import RankingRunner

    class _ImpressionRunner(RankingRunner):
        task = "impression"

        def _loss(self, predictions, batch, params=None):
            if isinstance(predictions, tuple):
                predictions = predictions[0]   # bare ranker (scores, ...)
            loss_fn = IMPRESSION_LOSSES[self.cfg.loss_n]
            return loss_fn(predictions, batch["target"], pos_len)

        def predict(self, builder, state):
            preds = []
            pos_nums, neg_nums = [], []
            rng = jax.random.PRNGKey(self.cfg.seed)
            for feed in builder.batches(self.cfg.eval_batch_size,
                                        shuffle=False):
                out = self._jit_eval(
                    state, {k: v for k, v in feed.items() if k != "time"},
                    rng)
                if isinstance(out, tuple):
                    out = out[0]               # bare ranker (scores, ...)
                out = np.asarray(out)
                keep = feed["row_mask"]
                preds.append(out[keep])
                pos_nums.append(feed["pos_num"][keep])
                neg_nums.append(feed["neg_num"][keep])
            return (np.concatenate(preds), np.concatenate(pos_nums),
                    np.concatenate(neg_nums))

        def evaluate(self, builder, state, topk=None, metrics=None):
            predictions, pos_num, neg_num = self.predict(builder, state)
            C = predictions.shape[1]
            ar = np.arange(C)[None, :]
            valid = np.where(ar < pos_len, ar < pos_num[:, None],
                             (ar - pos_len) < neg_num[:, None])
            predictions = np.where(valid, predictions, -np.inf)
            return evaluate_impressions(
                predictions, pos_num, neg_num, pos_len, topk or self.topk,
                metrics or self.metrics)

        def load_ranker(self, state, path: str):
            """Absorb a pretrained base-ranker checkpoint into the nested
            'ranker' scope (BaseRerankerModel.load_ranker :40-66)."""
            from flax import serialization
            with open(path, "rb") as f:
                loaded = serialization.msgpack_restore(f.read())
            params = dict(state["params"])
            wrapper = params.get("_RankerWrapper_0", params)
            cur = wrapper.get("ranker", params.get("ranker"))
            if cur is None:
                raise KeyError("model has no nested ranker scope")

            def merge(c, n):
                out = {}
                for k, v in c.items():
                    if k in n and isinstance(v, dict):
                        out[k] = merge(v, n[k])
                    elif k in n and getattr(n[k], "shape", None) == \
                            getattr(v, "shape", None):
                        out[k] = jnp.asarray(n[k], v.dtype)
                    else:
                        out[k] = v
                return out
            merged = merge(cur, loaded)
            if "_RankerWrapper_0" in params:
                params["_RankerWrapper_0"] = dict(
                    params["_RankerWrapper_0"], ranker=merged)
            else:
                params["ranker"] = merged
            state = dict(state)
            state["params"] = params
            state["opt_state"] = self.optimizer.init(params)
            return state

    return _ImpressionRunner(model, cfg, mesh=mesh)
