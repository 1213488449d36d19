"""FM backbone (SegRec/models/context/FM.py:13-110)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, LinearContext


class FMModel(nn.Module):
    """Factorization machine over the context features; candidate scores
    = linear term + 0.5 * (sum^2 - sum-of-squares) (FM.py:66-70)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        fm_vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                      self.emb_size, dtype=self.dtype,
                                      name="context_embedding")(feed, item_num)
        linear_value = LinearContext(self.feature_names, self.feature_max,
                                     dtype=self.dtype,
                                     name="linear_embedding")(feed, item_num)
        cross = 0.5 * (jnp.square(fm_vectors.sum(-2))
                       - jnp.square(fm_vectors).sum(-2))
        return linear_value + cross.sum(-1)
