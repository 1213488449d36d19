"""Sequential recommenders (ReChorus baselines for leave-frame ranking).

Behavioral spec: /root/reference/SkipPredBaseline/ReChorus/src/models/sequential/
 * SASRec.py — causal transformer over the history (position = distance from
   the end, causality-only attention mask, output at position length-1).
 * GRU4Rec.py — GRU over the history, final hidden through a dense head.
 * Caser.py — horizontal (per window height) + vertical convolutions over the
   (history, emb) image, fused with the user embedding.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..layers import INIT_001, dense, embed
from .dien import MaskedGRU


class _TransformerBlock(nn.Module):
    """utils/layers.py TransformerLayer: MHA (kq_same=False) + post-LN FFN."""
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, *, deterministic: bool = True):
        B, L, D = x.shape
        dk = D // self.n_heads
        q = dense(D, "q_linear", dtype=self.dtype)(x)
        k = dense(D, "k_linear", dtype=self.dtype)(x)
        v = dense(D, "v_linear", dtype=self.dtype)(x)

        def split(t):
            return t.reshape(B, L, self.n_heads, dk).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dk)
        scores = jnp.where(attn_mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
        drop = nn.Dropout(self.dropout)
        ctx = nn.LayerNorm(name="ln1")(drop(ctx,
                                            deterministic=deterministic) + x)
        out = dense(self.d_ff, "ff1", dtype=self.dtype)(ctx)
        out = dense(D, "ff2", dtype=self.dtype)(nn.relu(out))
        return nn.LayerNorm(name="ln2")(
            drop(out, deterministic=deterministic) + ctx)


class SASRecModel(nn.Module):
    user_num: int
    item_num: int
    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        valid_his = (history > 0).astype(jnp.int32)
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        his = i_embeddings(history)
        # position = distance from the sequence end (SASRec.py:forward)
        position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
        his = his + embed(self.history_max + 1, self.emb_size,
                          "p_embeddings", self.dtype)(
            jnp.clip(position, 0, self.history_max))
        causal = jnp.tril(jnp.ones((1, 1, L, L), bool))
        for b in range(self.num_layers):
            his = _TransformerBlock(self.emb_size, self.emb_size,
                                    self.num_heads, self.dropout,
                                    dtype=self.dtype,
                                    name=f"block_{b}")(
                his, causal, deterministic=deterministic)
        his = his * valid_his[:, :, None].astype(his.dtype)
        idx = jnp.clip(lengths - 1, 0, L - 1)
        his_vector = jnp.take_along_axis(his, idx[:, None, None].repeat(
            self.emb_size, axis=2), axis=1)[:, 0]
        i_vectors = i_embeddings(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)


class GRU4RecModel(nn.Module):
    user_num: int
    item_num: int
    emb_size: int = 64
    hidden_size: int = 100
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        his = i_embeddings(history)
        gru = MaskedGRU(self.hidden_size, dtype=self.dtype, name="rnn")
        _, last_h = gru(his, lengths)
        his_vector = dense(self.emb_size, "out", dtype=self.dtype)(last_h)
        i_vectors = i_embeddings(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)


class CaserModel(nn.Module):
    """Caser.py: the history embedding matrix treated as an image; vertical
    conv over time + horizontal convs of window heights 1..L, max-pooled."""
    user_num: int
    item_num: int
    emb_size: int = 64
    num_horizon: int = 16
    num_vertical: int = 8
    L: int = 4
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        uid = feed["user_id"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        pad = self.history_max - L
        if pad > 0:
            history = jnp.pad(history, ((0, 0), (0, pad)))
        his = embed(self.item_num, self.emb_size, "i_embeddings",
                    self.dtype)(history)  # (B, maxL, E)

        outs = []
        if self.num_vertical > 0:
            # vertical: one (maxL,) filter per output channel and emb column
            wv = self.param("conv_v", INIT_001,
                            (self.history_max, self.num_vertical))
            out_v = jnp.einsum("ble,lv->bve", his, wv.astype(his.dtype))
            outs.append(out_v.reshape(B, -1))
        if self.num_horizon > 0:
            hs = []
            for h in range(1, self.L + 1):
                wh = self.param(f"conv_h_{h}", INIT_001,
                                (h, self.emb_size, self.num_horizon))
                bh = self.param(f"conv_h_bias_{h}", nn.initializers.zeros,
                                (self.num_horizon,))
                windows = jnp.stack(
                    [his[:, t:t + h].reshape(B, -1)
                     for t in range(self.history_max - h + 1)], axis=1)
                conv = nn.relu(
                    windows @ wh.reshape(h * self.emb_size,
                                         self.num_horizon).astype(his.dtype)
                    + bh)
                hs.append(conv.max(axis=1))
            outs.append(jnp.concatenate(hs, -1))
        z = jnp.concatenate(outs, -1)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        z = nn.relu(dense(self.emb_size, "fc", dtype=self.dtype)(z))
        u = embed(self.user_num, self.emb_size, "u_embeddings",
                  self.dtype)(uid)
        his_vector = jnp.concatenate([z, u], -1)
        i_vectors = embed(self.item_num, 2 * self.emb_size, "i_out",
                          self.dtype)(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)


class NARMModel(nn.Module):
    """NARM.py: global GRU (last hidden = session intent) + local GRU whose
    per-step outputs are attention-pooled (sigmoid energies, NOT softmax —
    NARM.py:73-79), concatenated and projected to the item space."""
    user_num: int
    item_num: int
    emb_size: int = 64
    hidden_size: int = 100
    attention_size: int = 50
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        his = i_embeddings(history)
        _, hidden_g = MaskedGRU(self.hidden_size, dtype=self.dtype,
                                name="encoder_g")(his, lengths)
        output_l, _ = MaskedGRU(self.hidden_size, dtype=self.dtype,
                                name="encoder_l")(his, lengths)
        att_g = dense(self.attention_size, "A1", use_bias=False,
                      dtype=self.dtype)(hidden_g)
        att_l = dense(self.attention_size, "A2", use_bias=False,
                      dtype=self.dtype)(output_l)
        energy = dense(1, "attention_out", use_bias=False, dtype=self.dtype)(
            jax.nn.sigmoid(att_g[:, None, :] + att_l))
        energy = energy * (history > 0)[..., None].astype(energy.dtype)
        c_l = (energy * output_l).sum(1)
        pred_vector = dense(self.emb_size, "out", use_bias=False,
                            dtype=self.dtype)(
            jnp.concatenate([hidden_g, c_l], axis=1))
        i_vectors = i_embeddings(i_ids)
        return (pred_vector[:, None, :] * i_vectors).sum(-1)


class FPMCModel(nn.Module):
    """FPMC.py: factorized personalized Markov chain — user x candidate plus
    last-item x candidate bilinear terms. The reference dataset ships
    last_item_id explicitly; here it is the final valid history position."""
    user_num: int
    item_num: int
    emb_size: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        uid = feed["user_id"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        idx = jnp.clip(lengths - 1, 0, history.shape[1] - 1)
        last_item = jnp.take_along_axis(history, idx[:, None], axis=1)[:, 0]
        ui = embed(self.user_num, self.emb_size, "ui_embeddings",
                   self.dtype)(uid)
        iu = embed(self.item_num, self.emb_size, "iu_embeddings",
                   self.dtype)(i_ids)
        li = embed(self.item_num, self.emb_size, "li_embeddings",
                   self.dtype)(last_item)
        il = embed(self.item_num, self.emb_size, "il_embeddings",
                   self.dtype)(i_ids)
        return (ui[:, None, :] * iu).sum(-1) + (li[:, None, :] * il).sum(-1)


class TiSASRecModel(nn.Module):
    """TiSASRec.py: SASRec with relative position AND personalized time
    intervals — per-pair interval buckets |t_i - t_j| / user_min_interval
    (clamped to time_max) contribute additive key/value embeddings inside the
    causal attention (TimeIntervalMultiHeadAttention :118-176)."""
    user_num: int
    item_num: int
    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4
    time_max: int = 512
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        t_history = feed["history_times"].astype(jnp.int64)
        user_min_t = jnp.maximum(
            feed["user_min_intervals"].astype(jnp.int64), 1)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        H, E = self.num_heads, self.emb_size
        dk = E // H
        valid_his = (history > 0).astype(jnp.int32)

        i_embeddings = embed(self.item_num, E, "i_embeddings", self.dtype)
        his = i_embeddings(history)
        position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
        position = jnp.clip(position, 0, self.history_max)
        pos_k = embed(self.history_max + 1, E, "p_k_embeddings",
                      self.dtype)(position)
        pos_v = embed(self.history_max + 1, E, "p_v_embeddings",
                      self.dtype)(position)

        interval = jnp.abs(t_history[:, :, None] - t_history[:, None, :])
        interval = jnp.clip(interval // user_min_t[:, None, None],
                            0, self.time_max).astype(jnp.int32)
        inter_k = embed(self.time_max + 1, E, "t_k_embeddings",
                        self.dtype)(interval)   # (B, L, L, E)
        inter_v = embed(self.time_max + 1, E, "t_v_embeddings",
                        self.dtype)(interval)

        causal = jnp.tril(jnp.ones((1, 1, L, L), bool))
        drop = nn.Dropout(self.dropout)
        for b in range(self.num_layers):
            q = dense(E, f"q_linear_{b}", dtype=self.dtype)(his)
            k = dense(E, f"k_linear_{b}", dtype=self.dtype)(his) + pos_k
            v = dense(E, f"v_linear_{b}", dtype=self.dtype)(his) + pos_v

            def split(t):
                return t.reshape(B, L, H, dk).transpose(0, 2, 1, 3)
            qh, kh, vh = split(q), split(k), split(v)
            ik = inter_k.reshape(B, L, L, H, dk).transpose(0, 3, 1, 2, 4)
            iv = inter_v.reshape(B, L, L, H, dk).transpose(0, 3, 1, 2, 4)
            scores = qh @ kh.transpose(0, 1, 3, 2)
            scores = scores + (qh[:, :, :, None, :] * ik).sum(-1)
            scores = scores / np.sqrt(dk)
            scores = jnp.where(causal, scores, -jnp.inf)
            # the reference subtracts the GLOBAL max before softmax
            # (TiSASRec.py:172) — softmax is shift-invariant, same result
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(his.dtype)
            probs = jnp.where(jnp.isnan(probs), 0.0, probs)
            ctx = probs @ vh + (probs[..., None] * iv).sum(-2)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, E)
            # TimeIntervalTransformerLayer: post-LN residual + relu FFN
            x = nn.LayerNorm(name=f"ln1_{b}")(
                drop(ctx, deterministic=deterministic) + his)
            ff = dense(E, f"ff2_{b}", dtype=self.dtype)(
                nn.relu(dense(E, f"ff1_{b}", dtype=self.dtype)(x)))
            his = nn.LayerNorm(name=f"ln2_{b}")(
                drop(ff, deterministic=deterministic) + x)

        his = his * valid_his[:, :, None].astype(his.dtype)
        idx = jnp.clip(lengths - 1, 0, L - 1)
        his_vector = jnp.take_along_axis(
            his, idx[:, None, None].repeat(E, axis=2), axis=1)[:, 0]
        i_vectors = i_embeddings(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)


class ComiRecModel(nn.Module):
    """ComiRec.py: multi-interest extraction — K attention heads over the
    (position-embedded) history produce K interest vectors; training scores
    candidates with the interest closest to the TARGET (first candidate,
    ComiRec.py:83-88), evaluation takes the max over interests per candidate."""
    user_num: int
    item_num: int
    emb_size: int = 64
    attn_size: int = 8
    K: int = 2
    add_pos: bool = True
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        valid_his = (history > 0).astype(jnp.int32)
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        his = i_embeddings(history)
        his_pos = his
        if self.add_pos:
            position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
            his_pos = his + embed(self.history_max + 1, self.emb_size,
                                  "p_embeddings", self.dtype)(
                jnp.clip(position, 0, self.history_max))
        attn = dense(self.K, "W2", dtype=self.dtype)(
            jnp.tanh(dense(self.attn_size, "W1", dtype=self.dtype)(his_pos)))
        attn = jnp.where(valid_his[..., None] == 0, -jnp.inf, attn)
        attn = attn.swapaxes(-1, -2)                    # (B, K, L)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(his.dtype)
        attn = jnp.where(jnp.isnan(attn), 0.0, attn)
        interests = (his[:, None, :, :] * attn[..., None]).sum(-2)  # (B,K,E)

        i_vectors = i_embeddings(i_ids)
        if not deterministic:  # train phase (ComiRec.py:83-88)
            target = i_vectors[:, 0]
            target_pred = (interests * target[:, None, :]).sum(-1)  # (B, K)
            sel = jnp.argmax(target_pred, axis=-1)
            user_vector = jnp.take_along_axis(
                interests, sel[:, None, None].repeat(self.emb_size, 2),
                axis=1)[:, 0]
            return (user_vector[:, None, :] * i_vectors).sum(-1)
        scores = (interests[:, None, :, :] * i_vectors[:, :, None, :]).sum(-1)
        return scores.max(-1)


class ContraRecModel(nn.Module):
    """ContraRec (sequential/ContraRec.py): a sequence encoder trained with
    context-target contrastive loss (runner loss_n='ContraRec': temperature
    softmax over candidates) plus a context-context SupCon loss over two
    augmented views of the history (:85-106). The augmented views
    (mask/reorder, Dataset.augment :108-135) arrive in the feed as
    history_item_id_{a,b}; the CCC loss is computed in-forward over the full
    batch and sown pre-weighted by gamma into the 'losses' collection.
    Encoders: BERT4Rec (bidirectional transformer, :250-276), GRU4Rec,
    Caser-lite. The item table has one extra row — the mask token id equals
    item_num."""
    user_num: int
    item_num: int
    emb_size: int = 64
    encoder: str = "BERT4Rec"   # BERT4Rec | GRU4Rec
    num_layers: int = 2
    num_heads: int = 2
    history_max: int = 20
    gamma: float = 1.0
    ccc_temp: float = 0.2
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        i_embeddings = embed(self.item_num + 1, self.emb_size,
                             "i_embeddings", self.dtype)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)

        # construct encoder submodules ONCE; the same encoder is applied to
        # the raw history and (in training) both augmented views
        if self.encoder == "GRU4Rec":
            rnn = MaskedGRU(128, dtype=self.dtype, name="rnn")
            enc_out = dense(self.emb_size, "enc_out", use_bias=False,
                            dtype=self.dtype)

            def encode(his):
                _, last_h = rnn(his, lengths)
                return enc_out(last_h)
        else:   # BERT4Rec (ContraRec.py:250-276)
            p_emb = embed(self.history_max + 1, self.emb_size,
                          "p_embeddings", self.dtype)
            blocks = [_TransformerBlock(self.emb_size, self.emb_size,
                                        self.num_heads, self.dropout,
                                        dtype=self.dtype, name=f"block_{b}")
                      for b in range(self.num_layers)]

            def encode(his):
                B, L, E = his.shape
                valid = jnp.arange(L)[None, :] < lengths[:, None]
                position = jnp.arange(L)[None, :] * valid.astype(jnp.int32)
                x = his + p_emb(position)
                attn_mask = valid[:, None, None, :]
                for block in blocks:
                    x = block(x, attn_mask, deterministic=True)
                x = x * valid[:, :, None].astype(x.dtype)
                idx = jnp.clip(lengths - 1, 0, L - 1)
                return jnp.take_along_axis(
                    x, idx[:, None, None].repeat(E, 2), axis=1)[:, 0]

        his_vector = encode(
            i_embeddings(feed["history_item_id"].astype(jnp.int32)))
        i_vectors = i_embeddings(i_ids)
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)

        if "history_item_id_a" in feed and not deterministic:
            feats = []
            for key in ("history_item_id_a", "history_item_id_b"):
                v = encode(i_embeddings(feed[key].astype(jnp.int32)))
                feats.append(v / (jnp.linalg.norm(v, axis=-1, keepdims=True)
                                  + 1e-12))
            ccc = self._contra_loss(jnp.stack(feats, 1), i_ids[:, 0],
                                    feed["row_mask"].astype(self.dtype))
            self.sow("losses", "contrarec_ccc", self.gamma * ccc)
        return prediction

    def _contra_loss(self, features, labels, row_mask):
        """SupCon over two views (ContraLoss :141-193); padded rows excluded
        from anchors, positives, AND the denominator."""
        B = features.shape[0]
        pos_mask = (labels[:, None] == labels[None, :]).astype(self.dtype)
        pos_mask = jnp.tile(pos_mask, (2, 2))
        feats = jnp.concatenate([features[:, 0], features[:, 1]], axis=0)
        logits = feats @ feats.T / self.ccc_temp
        logits = logits - jax.lax.stop_gradient(logits.max(1, keepdims=True))
        rm2 = jnp.tile(row_mask, 2)
        valid_pair = rm2[:, None] * rm2[None, :]
        self_mask = 1.0 - jnp.eye(2 * B, dtype=self.dtype)
        logits_mask = self_mask * valid_pair
        pos_mask = pos_mask * logits_mask
        exp_logits = jnp.exp(logits) * logits_mask
        log_prob = logits - jnp.log(exp_logits.sum(1, keepdims=True) + 1e-10)
        mean_log_prob = (pos_mask * log_prob).sum(1) / (pos_mask.sum(1) + 1e-10)
        n = jnp.maximum(rm2.sum(), 1)
        return -self.ccc_temp * (mean_log_prob * rm2).sum() / n


class TiMiRecModel(nn.Module):
    """TiMiRec (sequential/TiMiRec.py): target-interest distillation.

    stage='pretrain': the multi-interest extractor alone (ComiRec-style K
    attention heads, optional position embedding and transformer layer),
    trained/evaluated exactly like ComiRec (:116-127).
    stage='finetune': a GRU interest predictor + projection produce
    pred_intent (bsz, K); the user vector is the pred_intent-softmax blend of
    the extractor's interests (:128-143), and a KL distillation loss between
    pred_intent and the (stop-gradient) cosine target_intent — scaled by
    temp^2 — is sown into 'losses' (:146-157). The pretrained extractor loads
    via the runner's partial load (--model_path + --load 1)."""
    user_num: int
    item_num: int
    emb_size: int = 64
    attn_size: int = 8
    K: int = 2
    add_pos: bool = True
    add_trm: bool = True
    temp: float = 1.0
    n_layers: int = 1
    stage: str = "finetune"     # pretrain | finetune
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        valid_his = (history > 0).astype(jnp.int32)

        # ---- MultiInterestExtractor (:163-199) ----
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        his = i_embeddings(history)
        if self.add_pos:
            position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
            his = his + embed(self.history_max + 1, self.emb_size,
                              "p_embeddings", self.dtype)(
                jnp.clip(position, 0, self.history_max))
        if self.add_trm:
            his = _TransformerBlock(self.emb_size, self.emb_size, 1,
                                    self.dropout, dtype=self.dtype,
                                    name="transformer")(
                his, valid_his[:, None, None, :].astype(bool),
                deterministic=deterministic)
            his = his * valid_his[:, :, None].astype(his.dtype)
        attn = dense(self.K, "W2", dtype=self.dtype)(
            jnp.tanh(dense(self.attn_size, "W1", dtype=self.dtype)(his)))
        attn = jnp.where(valid_his[..., None] == 0, -jnp.inf, attn)
        attn = attn.swapaxes(-1, -2)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(his.dtype)
        attn = jnp.where(jnp.isnan(attn), 0.0, attn)
        interests = (his[:, None, :, :] * attn[..., None]).sum(-2)  # (B,K,E)

        i_vectors = i_embeddings(i_ids)
        if self.stage == "pretrain":
            if not deterministic:   # ComiRec-style target-selected interest
                target = i_vectors[:, 0]
                sel = jnp.argmax((interests * target[:, None, :]).sum(-1), -1)
                user_vector = jnp.take_along_axis(
                    interests, sel[:, None, None].repeat(self.emb_size, 2),
                    axis=1)[:, 0]
                return (user_vector[:, None, :] * i_vectors).sum(-1)
            scores = (interests[:, None, :, :]
                      * i_vectors[:, :, None, :]).sum(-1)
            return scores.max(-1)

        # ---- finetune: InterestPredictor + proj (:128-143) ----
        pred_emb = embed(self.item_num + 1, self.emb_size,
                         "predictor_i_embeddings", self.dtype)(history)
        _, his_vector = MaskedGRU(self.emb_size, dtype=self.dtype,
                                  name="predictor_rnn")(pred_emb, lengths)
        x = his_vector
        drop = nn.Dropout(0.5)
        for i in range(self.n_layers - 1):
            x = nn.relu(drop(dense(self.emb_size, f"proj_{i}",
                                   dtype=self.dtype)(x),
                             deterministic=deterministic))
        pred_intent = dense(self.K, "proj_final", dtype=self.dtype)(x)

        if not deterministic:
            def norm(t):
                return t / (jnp.linalg.norm(t, axis=-1, keepdims=True)
                            + 1e-12)
            target_intent = (norm(interests)
                             * norm(i_vectors[:, 0])[:, None, :]).sum(-1)
            # KL(pred || target) * temp^2, batchmean (:146-157)
            p_log = jax.nn.log_softmax(pred_intent / self.temp, axis=1)
            q = jax.nn.softmax(
                jax.lax.stop_gradient(target_intent) / self.temp, axis=1)
            rm = feed["row_mask"].astype(jnp.float32)
            kl = (q * (jnp.log(jnp.clip(q, 1e-12, 1.0)) - p_log)).sum(1)
            kl = (kl * rm).sum() / jnp.maximum(rm.sum(), 1)
            self.sow("losses", "timirec_kl", self.temp * self.temp * kl)

        user_vector = (interests
                       * jax.nn.softmax(pred_intent, -1)[:, :, None]).sum(-2)
        return (user_vector[:, None, :] * i_vectors).sum(-1)


class SRGNNModel(nn.Module):
    """SRGNN (developing/SRGNN.py): session-graph GNN. The host feed carries
    the per-row session graph in fixed shapes (srgnn_items: unique nodes,
    srgnn_A: [L, 2L] in/out-normalized adjacency, srgnn_alias: position ->
    node index — built by the feed builder exactly like _get_slice :42-76).
    The gated GNN cell (:103-148), last-node + attention readout (:88-97)."""
    user_num: int
    item_num: int
    emb_size: int = 64
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        E = self.emb_size
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        history = feed["history_item_id"].astype(jnp.int32)
        alias = feed["srgnn_alias"].astype(jnp.int32)
        items = feed["srgnn_items"].astype(jnp.int32)
        A = feed["srgnn_A"].astype(self.dtype)
        B, L = history.shape
        valid_his = (history > 0).astype(self.dtype)

        std = 1.0 / np.sqrt(E)
        uni = nn.initializers.uniform(scale=2 * std)
        init = lambda key, shape, dtype=self.dtype: \
            uni(key, shape, dtype) - std
        i_embeddings = embed(self.item_num, E, "i_embeddings", self.dtype)
        hidden = i_embeddings(items)

        edge_in = dense(E, "linear_edge_in", dtype=self.dtype)
        edge_out = dense(E, "linear_edge_out", dtype=self.dtype)
        w_ih = self.param("w_ih", init, (3 * E, 2 * E))
        w_hh = self.param("w_hh", init, (3 * E, E))
        b_ih = self.param("b_ih", init, (3 * E,))
        b_hh = self.param("b_hh", init, (3 * E,))
        b_iah = self.param("b_iah", init, (E,))
        b_ioh = self.param("b_ioh", init, (E,))

        for _ in range(self.num_layers):
            a_in = A[:, :, :L] @ edge_in(hidden) + b_iah
            a_out = A[:, :, L:] @ edge_out(hidden) + b_ioh
            inputs = jnp.concatenate([a_in, a_out], -1)
            gi = inputs @ w_ih.T + b_ih
            gh = hidden @ w_hh.T + b_hh
            i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
            reset = jax.nn.sigmoid(i_r + h_r)
            inp = jax.nn.sigmoid(i_i + h_i)
            new = jnp.tanh(i_n + reset * h_n)
            hidden = (1 - inp) * hidden + inp * new

        seq_hidden = jnp.take_along_axis(
            hidden, alias[..., None].repeat(E, 2), axis=1)
        idx = jnp.clip(lengths - 1, 0, L - 1)
        ht = jnp.take_along_axis(
            seq_hidden, idx[:, None, None].repeat(E, 2), axis=1)[:, 0]
        alpha = dense(1, "linear3", use_bias=False, dtype=self.dtype)(
            jax.nn.sigmoid(
                dense(E, "linear1", dtype=self.dtype)(ht)[:, None, :]
                + dense(E, "linear2", dtype=self.dtype)(seq_hidden)))
        a = (alpha * seq_hidden * valid_his[:, :, None]).sum(1)
        his_vector = dense(E, "linear_transform", dtype=self.dtype)(
            jnp.concatenate([a, ht], 1))
        i_vectors = i_embeddings(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)


class CLRecModel(nn.Module):
    """CLRec (developing/CLRec.py): BERT4Rec encoder scored against
    candidates; training minimizes ONLY the in-batch InfoNCE between the
    sequence vector and the target item vector (loss :63-108 — the
    prediction head is untouched by the loss). The contrastive term is
    computed in-forward over the batch and sown; runner loss_n='CLRec'
    contributes zero so the sown term is the whole objective."""
    user_num: int
    item_num: int
    emb_size: int = 64
    temp: float = 0.2
    num_layers: int = 2
    num_heads: int = 2
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings",
                             self.dtype)
        history = feed["history_item_id"].astype(jnp.int32)
        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        B, L = history.shape
        his = i_embeddings(history)
        valid = jnp.arange(L)[None, :] < lengths[:, None]
        position = jnp.arange(L)[None, :] * valid.astype(jnp.int32)
        his = his + embed(self.history_max + 1, self.emb_size,
                          "p_embeddings", self.dtype)(position)
        attn_mask = valid[:, None, None, :]
        for b in range(self.num_layers):
            his = _TransformerBlock(self.emb_size, self.emb_size,
                                    self.num_heads, self.dropout,
                                    dtype=self.dtype, name=f"block_{b}")(
                his, attn_mask, deterministic=deterministic)
        his = his * valid[:, :, None].astype(his.dtype)
        idx = jnp.clip(lengths - 1, 0, L - 1)
        his_vector = jnp.take_along_axis(
            his, idx[:, None, None].repeat(self.emb_size, 2), axis=1)[:, 0]
        i_vectors = i_embeddings(i_ids)
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)

        if not deterministic:
            def norm(t):
                return t / (jnp.linalg.norm(t, axis=-1, keepdims=True)
                            + 1e-12)
            f0 = norm(his_vector)
            f1 = norm(i_vectors[:, 0])
            logits = f0 @ f1.T / self.temp
            logits = logits - jax.lax.stop_gradient(
                logits.max(1, keepdims=True))
            rm = feed["row_mask"].astype(self.dtype)
            # padded rows leave both the positives and the denominator
            exp_l = jnp.exp(logits) * rm[None, :]
            log_prob = logits - jnp.log(exp_l.sum(1, keepdims=True) + 1e-10)
            diag = jnp.diagonal(log_prob)
            loss = -(diag * rm).sum() / jnp.maximum(rm.sum(), 1)
            self.sow("losses", "clrec_infonce", loss)
        return prediction


class FourierTAModel(nn.Module):
    """FourierTA (developing/FourierTA.py): target attention over the
    history whose weights decay by a learned truncated-Fourier function of
    the (log-normalized) time delta (idft_decay :84-110); user + attended
    context scored against candidates with an item bias. The feed's
    history_times/time supply delta_t; norm_time is KDAReader.norm_time
    (log2(dt/t_scalar), clipped at 0)."""
    user_num: int
    item_num: int
    emb_size: int = 64
    t_scalar: int = 60
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        E = self.emb_size
        uid = feed["user_id"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        history = feed["history_item_id"].astype(jnp.int32)
        delta_t = feed["history_delta_t"]
        delta_n = jnp.maximum(
            jnp.log2(delta_t.astype(jnp.float32) / self.t_scalar + 1e-6), 0.0)
        B, L = history.shape
        u_vectors = embed(self.user_num, E, "user_embeddings",
                          self.dtype)(uid)
        i_embeddings = embed(self.item_num, E, "item_embeddings", self.dtype)
        i_vectors = i_embeddings(i_ids)
        his = i_embeddings(history)
        valid = (history > 0)[:, None, :]

        # attention energies (FourierTemporalAttention.forward :112-126)
        q = his[:, None, :, :] * i_vectors[:, :, None, :]
        att = dense(1, "A_out", use_bias=False, dtype=self.dtype)(
            jnp.tanh(dense(10, "A", dtype=self.dtype)(q))).squeeze(-1)
        att = att - jax.lax.stop_gradient(att.max())
        att = jnp.where(valid, att, -jnp.inf)
        att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(self.dtype)
        att = jnp.where(jnp.isnan(att), 0.0, att)

        # truncated-Fourier decay (idft_decay :84-99)
        d_f = E
        fr = self.param("freq_real", nn.initializers.normal(0.01), (d_f,))
        fi = self.param("freq_imag", nn.initializers.normal(0.01), (d_f,))
        freq = jnp.linspace(0, 1, d_f) / 2.0
        freqs = jnp.concatenate([freq, -freq])
        x_real = jnp.concatenate([fr, fr])
        x_imag = jnp.concatenate([fi, -fi])
        w = 2.0 * np.pi * freqs * delta_n[..., None]
        decay = ((jnp.cos(w) * x_real - jnp.sin(w) * x_imag).mean(-1)
                 / 2.0).clip(0, 1)
        att = att * jnp.where(valid, decay[:, None, :], 0.0)

        context = att @ his                              # (B, I, E)
        res = context
        context = dense(E, "W2", dtype=self.dtype)(
            nn.relu(dense(E, "W1", dtype=self.dtype)(context)))
        context = nn.Dropout(self.dropout)(context,
                                           deterministic=deterministic)
        context = nn.LayerNorm(name="layer_norm")(res + context)
        i_bias = embed(self.item_num, 1, "item_bias",
                       self.dtype)(i_ids).squeeze(-1)
        return ((u_vectors[:, None, :] + context) * i_vectors).sum(-1) + i_bias


class S3RecModel(nn.Module):
    """S3Rec (developing/S3Rec.py): self-supervised pretrain + finetune.

    Pretrain (feed carries mask_seq/.../seq_len from the feed builder's
    chunked-sequence corpus): masked-item prediction — sigmoid bilinear score
    of the encoder output vs positive/negative item embeddings at masked
    positions — and segment prediction — encoder(context with a masked span)
    vs encoder(positive/negative segment), both as BCE-toward-1 of
    sigmoid(pos - neg), summed and weighted by mip/sp weights (:59-113).
    Losses are sown; runner loss_n='S3Rec' contributes zero. Finetune/eval is
    a BERT4Rec scorer; the pretrained weights arrive via --model_path +
    --load 1 (partial restore). The item table has a mask-token row at
    item_num."""
    user_num: int
    item_num: int
    emb_size: int = 64
    num_layers: int = 2
    num_heads: int = 2
    mip_weight: float = 0.2
    sp_weight: float = 0.5
    history_max: int = 20
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        E = self.emb_size
        i_embeddings = embed(self.item_num + 1, E, "i_embeddings", self.dtype)
        p_emb = embed(self.history_max + 1, E, "p_embeddings", self.dtype)
        blocks = [_TransformerBlock(E, E, self.num_heads, self.dropout,
                                    dtype=self.dtype, name=f"block_{b}")
                  for b in range(self.num_layers)]
        in_ln = nn.LayerNorm(name="layer_norm")
        drop = nn.Dropout(self.dropout)

        def encode(seq_ids, lengths):
            his = i_embeddings(seq_ids)
            B, L, _ = his.shape
            valid = jnp.arange(L)[None, :] < lengths[:, None]
            position = jnp.arange(L)[None, :] * valid.astype(jnp.int32)
            x = his + p_emb(position)
            x = drop(in_ln(x), deterministic=deterministic)
            attn_mask = valid[:, None, None, :]
            for block in blocks:
                x = block(x, attn_mask, deterministic=deterministic)
            x = x * valid[:, :, None].astype(x.dtype)
            return x, valid

        def last(x, lengths):
            idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
            return jnp.take_along_axis(
                x, idx[:, None, None].repeat(E, 2), axis=1)[:, 0]

        if "mask_seq" in feed:   # pretrain batch
            lengths = feed["seq_len"].astype(jnp.int32)
            rm = feed["row_mask"].astype(self.dtype)
            mask_token = self.item_num
            seq_out, valid = encode(feed["mask_seq"].astype(jnp.int32),
                                    lengths)
            mip_n = dense(E, "mip_norm", dtype=self.dtype)
            pos_v = i_embeddings(feed["pos_item"].astype(jnp.int32))
            neg_v = i_embeddings(feed["neg_item"].astype(jnp.int32))
            pos_score = jax.nn.sigmoid((mip_n(seq_out) * pos_v).sum(-1))
            neg_score = jax.nn.sigmoid((mip_n(seq_out) * neg_v).sum(-1))
            mip_dis = jax.nn.sigmoid(pos_score - neg_score)
            mip_mask = ((feed["mask_seq"] == mask_token)
                        & valid).astype(self.dtype) * rm[:, None]
            mip_loss = (-jnp.log(jnp.clip(mip_dis, 1e-7, 1.0))
                        * mip_mask).sum()

            sp_n = dense(E, "sp_norm", dtype=self.dtype)
            ctx = last(encode(feed["mask_seg_seq"].astype(jnp.int32),
                              lengths)[0], lengths)
            pos_seg = last(encode(feed["pos_seg"].astype(jnp.int32),
                                  lengths)[0], lengths)
            neg_seg = last(encode(feed["neg_seg"].astype(jnp.int32),
                                  lengths)[0], lengths)
            ps = jax.nn.sigmoid((sp_n(ctx) * pos_seg).sum(-1))
            ns = jax.nn.sigmoid((sp_n(ctx) * neg_seg).sum(-1))
            sp_dis = jax.nn.sigmoid(ps - ns)
            sp_loss = (-jnp.log(jnp.clip(sp_dis, 1e-7, 1.0)) * rm).sum()

            self.sow("losses", "s3rec_pretrain",
                     self.mip_weight * mip_loss + self.sp_weight * sp_loss)
            return jnp.zeros((feed["mask_seq"].shape[0], 1), self.dtype)

        lengths = feed["lengths"].astype(jnp.int32)
        i_ids = feed["item_id"].astype(jnp.int32)
        his_vector = last(encode(feed["history_item_id"].astype(jnp.int32),
                                 lengths)[0], lengths)
        i_vectors = i_embeddings(i_ids)
        return (his_vector[:, None, :] * i_vectors).sum(-1)
