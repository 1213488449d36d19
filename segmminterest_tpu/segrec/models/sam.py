"""SAM context backbone.

Behavioral spec: /root/reference/SkipPredBaseline/ReChorus/src/models/context/SAM.py
(:25-75 base + :118-220 FuxiCTR SAMBlock): per-feature embeddings fed through
one of five self-attentive interaction types —
  SAM1  : identity (weighted pooling readout)
  SAM2A : pairwise dot-product scores scaling a learned (F, F, D) weight cube
  SAM2E : pairwise scores scaling the pairwise elementwise products
  SAM3A : attention over fields with the weight cube + optional Q residual,
          stacked num_layers deep
  SAM3E : attention over fields with elementwise products + residual
then concat / weighted / mean / sum aggregation into a Dense(1) head.
Aggregation coercions replicated (:41-46): SAM2* forces concat, SAM1 forces
weighted_pooling.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, dense


class SAMModel(nn.Module):
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    interaction_type: str = "SAM2E"   # SAM1 | SAM2A | SAM2E | SAM3A | SAM3E
    aggregation: str = "concat"       # concat | weighted_pooling | mean_pooling | sum_pooling
    num_layers: int = 1
    use_residual: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        F = ContextEmbedding(self.feature_names, self.feature_max,
                             self.emb_size, dtype=self.dtype,
                             name="context_embedding")(feed, item_num)
        # (B, I, n_fields, D)
        n_fields = F.shape[-2]
        agg = self.aggregation
        itype = self.interaction_type
        if itype in ("SAM2A", "SAM2E"):
            agg = "concat"            # SAM.py:41-43
        if itype == "SAM1":
            agg = "weighted_pooling"  # SAM.py:44-46
        drop = nn.Dropout(self.dropout)

        def pair_scores(x, k_name=None):
            k = dense(self.emb_size, k_name, use_bias=False,
                      dtype=self.dtype)(x) if k_name else x
            return jnp.einsum("...nd,...md->...nm", x, k)

        out = F
        if itype == "SAM1":
            pass
        elif itype == "SAM2A":
            W = self.param("W", nn.initializers.ones,
                           (n_fields, n_fields, self.emb_size))
            S = pair_scores(F)
            out = drop(S[..., None] * W, deterministic=deterministic)
        elif itype == "SAM2E":
            S = pair_scores(F)
            U = jnp.einsum("...nd,...md->...nmd", F, F)
            out = drop(S[..., None] * U, deterministic=deterministic)
        elif itype in ("SAM3A", "SAM3E"):
            for layer in range(self.num_layers):
                S = pair_scores(out, k_name=f"K_{layer}")
                if itype == "SAM3A":
                    W = self.param(f"W_{layer}", nn.initializers.ones,
                                   (n_fields, n_fields, self.emb_size))
                    nxt = (S[..., None] * W).sum(-2)
                else:
                    U = jnp.einsum("...nd,...md->...nmd", out, out)
                    nxt = (S[..., None] * U).sum(-2)
                if self.use_residual:
                    nxt = nxt + dense(self.emb_size, f"Q_{layer}",
                                      use_bias=False, dtype=self.dtype)(out)
                out = drop(nxt, deterministic=deterministic)
        else:
            raise ValueError(f"interaction_type={itype} not supported")

        B, I = out.shape[:2]
        if agg == "weighted_pooling":
            w = self.param("agg_weight", nn.initializers.ones, (n_fields, 1))
            pooled = (out.reshape(B, I, n_fields, -1) * w).sum(-2)
        elif agg == "concat":
            pooled = out.reshape(B, I, -1)
        elif agg == "mean_pooling":
            pooled = out.reshape(B, I, n_fields, -1).mean(-2)
        elif agg == "sum_pooling":
            pooled = out.reshape(B, I, n_fields, -1).sum(-2)
        else:
            raise ValueError(f"aggregation={agg} not supported")
        return dense(1, "output_layer", dtype=self.dtype)(pooled).squeeze(-1)
