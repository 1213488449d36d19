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
