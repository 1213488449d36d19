"""DCN / DCNv2 backbones.

Behavioral spec: /root/reference/SegRec/models/context/DCN.py and
DCNv2.py:20-169 — cross network over the flattened per-feature embeddings;
v2 supports a full-matrix cross (cross_net_2), a mixed low-rank
multi-expert cross with gating (cross_net_mix), and parallel/stacked deep
structure.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, MLPBlock, dense

RANDN = nn.initializers.normal(stddev=1.0)


class DCNModel(nn.Module):
    """DCN v1: x_{l+1} = x0 * (x_l . w_l) + b_l + x_l (DCN.py)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    cross_layer_num: int = 6
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                   self.emb_size, dtype=self.dtype,
                                   name="context_embedding")(feed, item_num)
        B, I = vectors.shape[:2]
        x0 = vectors.reshape(B, I, -1)
        pre = x0.shape[-1]
        xl = x0
        for l in range(self.cross_layer_num):
            w = self.param(f"cross_w_{l}", RANDN, (pre,))
            b = self.param(f"cross_b_{l}", nn.initializers.zeros, (pre,))
            xl = x0 * (xl @ w)[..., None] + b + xl
        deep = MLPBlock(self.layers, dropout=self.dropout, dtype=self.dtype,
                        name="deep_layers")(x0, deterministic=deterministic)
        out = dense(1, "predict_layer", dtype=self.dtype)(
            jnp.concatenate([xl, deep], -1))
        return out.squeeze(-1)


class DCNv2Model(nn.Module):
    """DCNv2 (DCNv2.py:43-169)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    cross_layer_num: int = 6
    mixed: bool = True
    structure: str = "parallel"   # parallel | stacked
    expert_num: int = 2
    low_rank: int = 64
    # L2 (sum of 2-norms) on the full-matrix cross weights, only in the
    # non-mixed variant (DCNv2.py:190-196); sown pre-weighted as 'reg_loss'
    reg_weight: float = 2.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                   self.emb_size, dtype=self.dtype,
                                   name="context_embedding")(feed, item_num)
        B, I = vectors.shape[:2]
        x0 = vectors.reshape(B, I, -1)
        pre = x0.shape[-1]

        if self.mixed:
            # low-rank multi-expert cross with sigmoid gating
            # (DCNv2.py:93-141)
            gates = [dense(1, f"gating_{e}", dtype=self.dtype)
                     for e in range(self.expert_num)]
            xl = x0
            for l in range(self.cross_layer_num):
                U = self.param(f"cross_u_{l}", RANDN,
                               (self.expert_num, pre, self.low_rank))
                V = self.param(f"cross_v_{l}", RANDN,
                               (self.expert_num, pre, self.low_rank))
                C = self.param(f"cross_c_{l}", RANDN,
                               (self.expert_num, self.low_rank, self.low_rank))
                bias = self.param(f"cross_bias_{l}",
                                  nn.initializers.zeros, (pre,))
                expert_outs, gate_scores = [], []
                for e in range(self.expert_num):
                    gate_scores.append(gates[e](xl))          # (B, I, 1)
                    v = jnp.tanh(jnp.einsum("bip,pr->bir", xl, V[e]))
                    c = jnp.tanh(jnp.einsum("bir,rs->bis", v, C[e]))
                    u = jnp.einsum("bis,ps->bip", c, U[e]) + bias
                    expert_outs.append(x0 * u)
                experts = jnp.stack(expert_outs, -1)          # (B, I, p, E)
                gate = jax.nn.softmax(
                    jnp.concatenate(gate_scores, -1), axis=-1)  # (B, I, E)
                xl = jnp.einsum("bipe,bie->bip", experts, gate) + xl
        else:
            xl = x0
            reg = 0.0
            for l in range(self.cross_layer_num):
                W = self.param(f"cross_w2_{l}", RANDN, (pre, pre))
                bias = self.param(f"cross_bias_{l}",
                                  nn.initializers.zeros, (pre,))
                xl = x0 * (jnp.einsum("pq,biq->bip", W, xl) + bias) + xl
                reg = reg + jnp.sqrt((W.astype(jnp.float32) ** 2).sum())
            self.sow("losses", "reg_loss", self.reg_weight * reg)

        deep_in = x0 if self.structure == "parallel" else xl
        deep = MLPBlock(self.layers, dropout=self.dropout, dtype=self.dtype,
                        name="deep_layers")(deep_in,
                                            deterministic=deterministic)
        if self.structure == "parallel":
            out = dense(1, "predict_layer", dtype=self.dtype)(
                jnp.concatenate([xl, deep], -1))
        else:
            out = dense(1, "predict_layer", dtype=self.dtype)(deep)
        return out.squeeze(-1)
