"""AutoInt backbone (SegRec/models/context/AutoInt.py:20-112): FM embeddings
-> stacked multi-head self-attention over the feature axis with linear
residuals -> deep MLP + linear term."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, LinearContext, MLPBlock, dense


class _FeatureSelfAttention(nn.Module):
    """utils/layers.py MultiHeadAttention (kq_same=False, bias=False) applied
    over the feature axis of (B, I, F, D). Max-subtracted softmax and
    NaN-to-zero like the reference (:55-63)."""
    d_model: int
    attention_d: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_k = self.attention_d // self.n_heads
        q = dense(self.attention_d, "q_linear", use_bias=False,
                  dtype=self.dtype)(x)
        k = dense(self.attention_d, "k_linear", use_bias=False,
                  dtype=self.dtype)(x)
        v = dense(self.attention_d, "v_linear", use_bias=False,
                  dtype=self.dtype)(x)

        def split(t):
            return t.reshape(t.shape[:-1] + (self.n_heads, d_k)) \
                .swapaxes(-2, -3)
        q, k, v = split(q), split(k), split(v)
        scores = q @ k.swapaxes(-2, -1) / jnp.sqrt(
            jnp.asarray(d_k, jnp.float32)).astype(x.dtype)
        scores = jax.nn.softmax(scores - scores.max(), axis=-1)
        out = scores @ v
        return out.swapaxes(-2, -3).reshape(x.shape[:-1] + (self.attention_d,))


class AutoIntModel(nn.Module):
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    attention_size: int = 32
    num_heads: int = 1
    num_layers: int = 1
    layers: Sequence[int] = (64,)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        emb = ContextEmbedding(self.feature_names, self.feature_max,
                               self.emb_size, dtype=self.dtype,
                               name="context_embedding")(feed, item_num)
        linear_value = LinearContext(self.feature_names, self.feature_max,
                                     dtype=self.dtype,
                                     name="linear_embedding")(feed, item_num)
        att_input = self.emb_size
        x = emb
        for i in range(self.num_layers):
            attention = _FeatureSelfAttention(
                d_model=att_input, attention_d=self.attention_size,
                n_heads=self.num_heads, dtype=self.dtype,
                name=f"autoint_attention_{i}")(x)
            residual = dense(self.attention_size, f"residual_{i}",
                             dtype=self.dtype)(x)
            x = nn.relu(attention + residual)
            att_input = self.attention_size
        B, I = x.shape[:2]
        deep = MLPBlock(self.layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="deep_layers")(
            x.reshape(B, I, -1), deterministic=deterministic)
        return linear_value + deep.squeeze(-1)
