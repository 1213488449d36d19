"""Shared layers for SegRec models.

Behavioral spec: /root/reference/SegRec/utils/layers.py (MLP_Block via
models' usage, MultiHeadTargetAttention, Dice) and
/root/reference/SegRec/models/context/FM.py:30-66 (the per-feature
embedding-dict pattern every context model shares).

Init: every Linear/Embedding weight AND bias ~ N(0, 0.01)
(BaseModel.init_weights :37-44).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

INIT_001 = nn.initializers.normal(stddev=0.01)


def dense(features: int, name: str, use_bias: bool = True,
          dtype=jnp.float32) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, kernel_init=INIT_001,
                    bias_init=INIT_001, dtype=dtype, name=name)


def embed(num: int, features: int, name: str, dtype=jnp.float32) -> nn.Embed:
    return nn.Embed(num, features, embedding_init=INIT_001, dtype=dtype,
                    name=name)


class ContextEmbedding(nn.Module):
    """Per-feature embedding dict (FM.py:30-43): Embedding for *_c / *_id
    features, Dense(1 -> size, no bias) for numeric features. Returns
    (B, I, n_feat, size) stacked vectors; scalar features are broadcast over
    the candidate axis."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    vec_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed: Dict[str, jax.Array], item_num: int):
        vectors = []
        for f in self.feature_names:
            x = feed[f]
            if f.endswith("_c") or f.endswith("_id"):
                v = embed(self.feature_max[f], self.vec_size,
                          name=f"emb_{f}", dtype=self.dtype)(x.astype(jnp.int32))
            else:
                v = dense(self.vec_size, name=f"emb_{f}", use_bias=False,
                          dtype=self.dtype)(
                    x.astype(self.dtype)[..., None])
            if v.ndim == 2:  # (B, size) scalar feature -> broadcast over items
                v = jnp.repeat(v[:, None, :], item_num, axis=1)
            vectors.append(v)
        return jnp.stack(vectors, axis=-2)  # (B, I, n_feat, size)


class LinearContext(nn.Module):
    """The wide/linear half: per-feature 1-d embeddings summed + bias
    (FM.py:36-38,55-63)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed: Dict[str, jax.Array], item_num: int):
        values = []
        for f in self.feature_names:
            x = feed[f]
            if f.endswith("_c") or f.endswith("_id"):
                v = embed(self.feature_max[f], 1, name=f"lin_{f}",
                          dtype=self.dtype)(x.astype(jnp.int32))
            else:
                v = dense(1, name=f"lin_{f}", use_bias=False,
                          dtype=self.dtype)(x.astype(self.dtype)[..., None])
            if v.ndim == 2:
                v = jnp.repeat(v[:, None, :], item_num, axis=1)
            values.append(v)
        bias = self.param("overall_bias", nn.initializers.constant(0.01), (1,))
        return jnp.concatenate(values, axis=-1).sum(-1) + bias  # (B, I)


class MLPBlock(nn.Module):
    """FuxiCTR-style MLP (utils/layers.py:200-244): per hidden layer
    Dense -> [BatchNorm] -> activation -> dropout, optional output head.
    ``activation='dice'`` uses the Dice module (which holds its own affine
    BatchNorm); models using batch_norm/dice must run with a mutable
    'batch_stats' collection during training."""
    hidden_units: Sequence[int]
    output_dim: Optional[int] = None
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, h in enumerate(self.hidden_units):
            x = dense(h, name=f"dense_{i}", dtype=self.dtype)(x)
            if self.batch_norm:
                shape = x.shape
                x = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn_{i}")(
                    x.reshape(-1, shape[-1])).reshape(shape)
            a = self.activation.lower()
            if a == "relu":
                x = nn.relu(x)
            elif a == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif a == "tanh":
                x = jnp.tanh(x)
            elif a == "dice":
                x = Dice(h, dtype=self.dtype, name=f"dice_{i}")(
                    x, deterministic=deterministic)
            else:
                raise ValueError(f"unknown activation {self.activation}")
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.output_dim is not None:
            x = dense(self.output_dim, name="dense_out", dtype=self.dtype)(x)
        return x


class MultiHeadTargetAttention(nn.Module):
    """Target attention (utils/layers.py:120-…; FuxiCTR): one query item
    attends over the history sequence."""
    input_dim: int = 64
    attention_dim: int = 64
    num_heads: int = 1
    dropout: float = 0.0
    use_scale: bool = True
    use_qkvo: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target_item, history_sequence, mask=None, *,
                 deterministic: bool = True):
        # target_item: (B, D); history_sequence: (B, L, D); mask: (B, L) bool
        att_dim = self.attention_dim if self.use_qkvo else self.input_dim
        head_dim = att_dim // self.num_heads
        if self.use_qkvo:
            q = dense(att_dim, "W_q", use_bias=False,
                      dtype=self.dtype)(target_item)
            k = dense(att_dim, "W_k", use_bias=False,
                      dtype=self.dtype)(history_sequence)
            v = dense(att_dim, "W_v", use_bias=False,
                      dtype=self.dtype)(history_sequence)
        else:
            q, k, v = target_item, history_sequence, history_sequence
        B, L = history_sequence.shape[0], history_sequence.shape[1]
        q = q.reshape(B, 1, self.num_heads, head_dim)
        k = k.reshape(B, L, self.num_heads, head_dim)
        v = v.reshape(B, L, self.num_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if self.use_scale:
            scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32)
                                       ).astype(scores.dtype)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(self.dtype)
        if self.dropout > 0:
            probs = nn.Dropout(self.dropout)(probs,
                                             deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, att_dim)
        if self.use_qkvo:
            out = dense(self.input_dim, "W_o", use_bias=False,
                        dtype=self.dtype)(out)
        return out


class Dice(nn.Module):
    """Dice activation (utils/layers.py:246-289; Zhou et al. 2018):
    alpha * (1 - p) * x + p * x with p = sigmoid(BatchNorm(x)) — the affine
    BatchNorm1d(eps=1e-8) of the reference. Training requires a mutable
    'batch_stats' collection."""
    emb_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        bn = nn.BatchNorm(use_running_average=deterministic,
                          momentum=0.9, epsilon=1e-8, dtype=self.dtype)
        shape = x.shape
        p = jax.nn.sigmoid(bn(x.reshape(-1, shape[-1])).reshape(shape))
        alpha = self.param("alpha", nn.initializers.zeros, (self.emb_size,))
        return p * x + (1.0 - p) * alpha * x
