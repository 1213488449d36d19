"""FinalMLP backbone (SegRec/models/context/FinalMLP.py:15-210): two-stream
MLPs over (optionally feature-selected) flattened embeddings, fused by
InteractionAggregation."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...models.interest import InteractionAggregation
from ..layers import MLPBlock, dense, embed


class FeatureSelection(nn.Module):
    """FinalMLP.py:141-196: per-stream sigmoid gate over the flattened
    embedding; with no context features the gate input is a learned bias."""
    feature_dim: int
    embedding_dim: int
    fs_hidden_units: Sequence[int]
    fs1_context: Sequence[str] = ()
    fs2_context: Sequence[str] = ()
    feature_max: Dict[str, int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, flat_emb, *, deterministic: bool = True):
        def ctx_input(names, tag):
            if not names:
                bias = self.param(f"fs{tag}_ctx_bias", nn.initializers.zeros,
                                  (1, self.embedding_dim))
                return jnp.broadcast_to(
                    bias[None], (flat_emb.shape[0], flat_emb.shape[1],
                                 self.embedding_dim))
            embs = []
            for ctx in names:
                x = feed[ctx]
                if ctx.endswith("_c"):
                    v = embed(self.feature_max[ctx], self.embedding_dim,
                              f"fs{tag}_emb_{ctx}", self.dtype)(
                        x.astype(jnp.int32))
                else:
                    v = dense(self.embedding_dim, f"fs{tag}_emb_{ctx}",
                              dtype=self.dtype)(
                        x.astype(self.dtype)[..., None])
                if v.ndim == 2:
                    v = jnp.repeat(v[:, None], flat_emb.shape[1], axis=1)
                embs.append(v)
            return jnp.concatenate(embs, -1)

        g1 = MLPBlock(self.fs_hidden_units, output_dim=self.feature_dim,
                      dtype=self.dtype, name="fs1_gate")(
            ctx_input(self.fs1_context, 1), deterministic=deterministic)
        g2 = MLPBlock(self.fs_hidden_units, output_dim=self.feature_dim,
                      dtype=self.dtype, name="fs2_gate")(
            ctx_input(self.fs2_context, 2), deterministic=deterministic)
        feat1 = flat_emb * jax.nn.sigmoid(g1) * 2
        feat2 = flat_emb * jax.nn.sigmoid(g2) * 2
        return feat1, feat2


class FinalMLPModel(nn.Module):
    feature_names: Sequence[str]   # user/item/situation + ids
    feature_max: Dict[str, int]
    emb_size: int = 64
    mlp1_hidden_units: Sequence[int] = (64,)
    mlp2_hidden_units: Sequence[int] = (64,)
    use_fs: bool = True
    fs_hidden_units: Sequence[int] = (64,)
    fs1_context: Sequence[str] = ()
    fs2_context: Sequence[str] = ()
    num_heads: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        # embedding dict identical to FM's but assembled user/item/situ wise
        # (FinalMLP.py:76-96)
        from ..layers import ContextEmbedding
        X = ContextEmbedding(self.feature_names, self.feature_max,
                             self.emb_size, dtype=self.dtype,
                             name="embedding_dict")(feed, item_num)
        B, I = X.shape[:2]
        flat_emb = X.reshape(B, I, -1)
        if self.use_fs:
            feat1, feat2 = FeatureSelection(
                feature_dim=flat_emb.shape[-1], embedding_dim=self.emb_size,
                fs_hidden_units=self.fs_hidden_units,
                fs1_context=self.fs1_context, fs2_context=self.fs2_context,
                feature_max=self.feature_max, dtype=self.dtype,
                name="fs_module")(feed, flat_emb,
                                  deterministic=deterministic)
        else:
            feat1, feat2 = flat_emb, flat_emb
        m1 = MLPBlock(self.mlp1_hidden_units, dropout=self.dropout,
                      dtype=self.dtype, name="mlp1")(
            feat1, deterministic=deterministic)
        m2 = MLPBlock(self.mlp2_hidden_units, dropout=self.dropout,
                      dtype=self.dtype, name="mlp2")(
            feat2, deterministic=deterministic)
        return InteractionAggregation(
            x_dim=self.mlp1_hidden_units[-1], y_dim=self.mlp2_hidden_units[-1],
            output_dim=1, num_heads=self.num_heads, dtype=self.dtype,
            name="fusion_module")(m1, m2)
