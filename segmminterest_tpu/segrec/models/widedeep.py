"""WideDeep backbone (SegRec/models/context/WideDeep.py:15-84)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, LinearContext, MLPBlock


class WideDeepModel(nn.Module):
    """wide = FM linear term; deep = MLP over the flattened per-feature
    embeddings (WideDeep.py:40-46)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        deep_vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                        self.emb_size, dtype=self.dtype,
                                        name="context_embedding")(feed, item_num)
        wide_prediction = LinearContext(self.feature_names, self.feature_max,
                                        dtype=self.dtype,
                                        name="linear_embedding")(feed, item_num)
        B, I = deep_vectors.shape[:2]
        deep_vector = deep_vectors.reshape(B, I, -1)
        deep_prediction = MLPBlock(self.layers, output_dim=1,
                                   dropout=self.dropout, dtype=self.dtype,
                                   name="deep_layers")(
            deep_vector, deterministic=deterministic).squeeze(-1)
        return deep_prediction + wide_prediction
