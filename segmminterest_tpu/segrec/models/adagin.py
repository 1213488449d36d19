"""AdaGIN backbone (SegRec/models/context/AdaGIN.py:20-259): adaptive graph
interaction network over the feature fields.

Quirks replicated:
 * the "cold" adjacency is gumbel-softmaxed then every positive entry is
   filled with 1.0 — soft gumbel outputs are strictly positive, so the cold
   matrix is effectively all-ones (+diagonal) (AdaGIN.py build_cold_matrix);
 * gumbel sampling happens in eval too (torch F.gumbel_softmax always
   samples) — the 'gumbel' rng collection is required at all times.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, LinearContext, MLPBlock, dense

RANDN = nn.initializers.normal(stddev=1.0)


def gumbel_softmax(rng, logits, tau, axis):
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    return jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=axis)


class AutoGraphLayer(nn.Module):
    """AdaGIN.py:179-259."""
    num_fields: int
    embedding_dim: int
    warm_dim: int
    cold_dim: int
    warm_tau: float = 1.0
    cold_tau: float = 0.01
    only_use_last_layer: bool = True
    gnn_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_emb):
        # feature_emb: (N, F, D)
        N, F, D = feature_emb.shape
        warm_l1 = dense(self.warm_dim, "warm_W1", dtype=self.dtype)
        warm_l2 = dense(1, "warm_W2", use_bias=False, dtype=self.dtype)
        cold_w = dense(1, "cold_W", use_bias=False, dtype=self.dtype)
        W_sage = self.param("W_GraphSage",
                            nn.initializers.variance_scaling(
                                1.0, "fan_avg", "normal"),
                            (self.num_fields, D, D))
        leaky = lambda x: jax.nn.leaky_relu(x, 0.01)

        h = feature_emb
        h_list = []
        for i in range(self.gnn_layers):
            # cold adjacency (build_cold_matrix): pairwise concat -> linear
            # -> leaky relu -> gumbel softmax -> all-positive fill 1.0
            e1 = jnp.repeat(h[:, :, None, :], F, axis=2)
            e2 = jnp.repeat(h[:, None, :, :], F, axis=1)
            alpha = leaky(cold_w(jnp.concatenate([e1, e2], -1))[..., 0])
            cold = gumbel_softmax(self.make_rng("gumbel"), alpha,
                                  self.cold_tau, axis=-1)
            cold = jnp.where(cold > 0, 1.0, 0.0)
            cold = jnp.where(jnp.eye(F, dtype=bool)[None], 1.0, cold)
            new_h = jnp.einsum("nfg,ngd->nfd", cold.astype(h.dtype), h)
            new_h = jnp.einsum("fde,nfd->nfe", W_sage.astype(h.dtype), new_h)
            # warm gate (build_warm_matrix): gumbel softmax over fields
            t = warm_l2(nn.relu(warm_l1(new_h)))
            warm = gumbel_softmax(self.make_rng("gumbel"), t, self.warm_tau,
                                  axis=1).astype(h.dtype)
            new_h = leaky(new_h * warm)
            if (not self.only_use_last_layer) or self.gnn_layers == i + 1:
                h_list.append(h)
            h = new_h + feature_emb  # ResNet
        return h_list


class AdaGINModel(nn.Module):
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    warm_dim: int = 64
    cold_dim: int = 64
    warm_tau: float = 1.0
    cold_tau: float = 0.01
    fi_hidden_units: Sequence[int] = (64, 64)
    w_hidden_units: Sequence[int] = (64, 64)
    num_gnn_layers: int = 3
    only_use_last_layer: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        emb = ContextEmbedding(self.feature_names, self.feature_max,
                               self.emb_size, dtype=self.dtype,
                               name="context_embedding")(feed, item_num)
        # linear embeddings exist in the reference via _define_params_FM but
        # their output is unused by AdaGIN.forward; omitted here.
        B, I, F, D = emb.shape
        h_list = AutoGraphLayer(
            num_fields=F, embedding_dim=D, warm_dim=self.warm_dim,
            cold_dim=self.cold_dim, warm_tau=self.warm_tau,
            cold_tau=self.cold_tau,
            only_use_last_layer=self.only_use_last_layer,
            gnn_layers=self.num_gnn_layers, dtype=self.dtype,
            name="AutoGraph")(emb.reshape(B * I, F, D))

        iu, ju = jnp.triu_indices(F)
        pre_ep = len(iu) * D
        mk = lambda units, name, out_act=None: MLPBlock(
            units, output_dim=1, dropout=self.dropout, dtype=self.dtype,
            name=name)
        mlp1 = mk(self.fi_hidden_units, "mlp1")
        W1 = mk(self.w_hidden_units, "W1")
        mlp2 = mk(self.fi_hidden_units, "mlp2")
        W2 = mk(self.w_hidden_units, "W2")
        mlp3 = mk(self.fi_hidden_units, "mlp3")
        W3 = mk(self.w_hidden_units, "W3")
        leaky = lambda x: jax.nn.leaky_relu(x, 0.01)

        fsw = self.param("final_score_weight", RANDN,
                         (self.num_gnn_layers,))
        y = 0.0
        for li, h in enumerate(h_list):
            embs_ep = h[:, iu, :] * h[:, ju, :]        # (N, P, D)
            embs_ip = embs_ep.sum(-1)                  # (N, P)
            embs_flat = h.reshape(h.shape[0], -1)      # (N, F*D)
            for W, X, inp in ((W1, mlp1, embs_ep.reshape(-1, pre_ep)),
                              (W2, mlp2, embs_ip),
                              (W3, mlp3, embs_flat)):
                wx = leaky(W(inp, deterministic=deterministic)) \
                    * X(inp, deterministic=deterministic)
                y = y + wx[..., 0]
            if not self.only_use_last_layer:
                y = y * fsw[li]
        return y.reshape(B, I)
