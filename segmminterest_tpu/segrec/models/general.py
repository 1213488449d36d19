"""General (non-sequential) recommenders — the ReChorus baselines the paper
evaluates on the leave-frame ranking task.

Behavioral spec: /root/reference/SkipPredBaseline/ReChorus/src/models/general/
 * BPRMF.py — dot-product MF.
 * NeuMF.py — GMF ++ MLP towers.
 * LightGCN.py — n-layer normalized-adjacency propagation over the train
   graph, mean of layer embeddings; TPU-native propagation via segment_sum
   over the edge list (replaces the torch sparse matmul).
 * DirectAU.py — MF scored by dot product, trained with alignment +
   gamma * uniformity (custom loss, exposed via ``direct_au_loss``).
 * POP.py — item train popularity, no parameters (run with epoch 0).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..layers import INIT_001, MLPBlock, dense, embed


class BPRMFModel(nn.Module):
    user_num: int
    item_num: int
    emb_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        u = embed(self.user_num, self.emb_size, "u_embeddings",
                  self.dtype)(feed["user_id"].astype(jnp.int32))
        i = embed(self.item_num, self.emb_size, "i_embeddings",
                  self.dtype)(feed["item_id"].astype(jnp.int32))
        return (u[:, None, :] * i).sum(-1)


class NeuMFModel(nn.Module):
    """GMF + MLP fusion (ReChorus general/NeuMF.py)."""
    user_num: int
    item_num: int
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        uid = feed["user_id"].astype(jnp.int32)
        iid = feed["item_id"].astype(jnp.int32)
        I = iid.shape[1]
        mf_u = embed(self.user_num, self.emb_size, "mf_u", self.dtype)(uid)
        mf_i = embed(self.item_num, self.emb_size, "mf_i", self.dtype)(iid)
        mlp_u = embed(self.user_num, self.emb_size, "mlp_u", self.dtype)(uid)
        mlp_i = embed(self.item_num, self.emb_size, "mlp_i", self.dtype)(iid)
        gmf = mf_u[:, None, :] * mf_i
        x = jnp.concatenate(
            [jnp.repeat(mlp_u[:, None, :], I, axis=1), mlp_i], -1)
        x = MLPBlock(self.layers, dropout=self.dropout, dtype=self.dtype,
                     name="mlp")(x, deterministic=deterministic)
        out = dense(1, "prediction", use_bias=False, dtype=self.dtype)(
            jnp.concatenate([gmf, x], -1))
        return out[..., 0]


class LightGCNModel(nn.Module):
    """LightGCN encoder: embeddings propagated n_layers times over the
    symmetric-normalized train graph and averaged. The edge list and degree
    normalization are static fields baked from the corpus; propagation is two
    segment_sums per layer (all-users/all-items — LightGCN recomputes the
    full graph embedding each forward, as the reference does)."""
    user_num: int
    item_num: int
    edge_users: Any         # (E,) int32 train edges
    edge_items: Any         # (E,) int32
    emb_size: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        u_emb = self.param("u_embeddings",
                           nn.initializers.normal(0.01),
                           (self.user_num, self.emb_size))
        i_emb = self.param("i_embeddings",
                           nn.initializers.normal(0.01),
                           (self.item_num, self.emb_size))
        eu = jnp.asarray(self.edge_users)
        ei = jnp.asarray(self.edge_items)
        du = jnp.zeros(self.user_num).at[eu].add(1.0).clip(1.0)
        di = jnp.zeros(self.item_num).at[ei].add(1.0).clip(1.0)
        norm = 1.0 / jnp.sqrt(du[eu] * di[ei])  # (E,)

        ue, ie = u_emb, i_emb
        u_acc, i_acc = u_emb, i_emb
        for _ in range(self.n_layers):
            msgs_u = ie[ei] * norm[:, None]
            new_u = jnp.zeros_like(ue).at[eu].add(msgs_u)
            msgs_i = ue[eu] * norm[:, None]
            new_i = jnp.zeros_like(ie).at[ei].add(msgs_i)
            ue, ie = new_u, new_i
            u_acc = u_acc + ue
            i_acc = i_acc + ie
        u_final = u_acc / (self.n_layers + 1)
        i_final = i_acc / (self.n_layers + 1)

        u = u_final[feed["user_id"].astype(jnp.int32)]
        i = i_final[feed["item_id"].astype(jnp.int32)]
        return (u[:, None, :] * i).sum(-1)


class DirectAUModel(nn.Module):
    """MF with the DirectAU alignment/uniformity objective (general/DirectAU.py).
    ``direct_au_loss`` is picked up by the runner when loss_n='DirectAU'."""
    user_num: int
    item_num: int
    emb_size: int = 64
    gamma: float = 1.0
    dtype: Any = jnp.float32

    def embeddings(self, feed):
        u = embed(self.user_num, self.emb_size, "u_embeddings",
                  self.dtype)(feed["user_id"].astype(jnp.int32))
        i = embed(self.item_num, self.emb_size, "i_embeddings",
                  self.dtype)(feed["item_id"].astype(jnp.int32))
        return u, i

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        u, i = self.embeddings(feed)
        return (u[:, None, :] * i).sum(-1)

    @staticmethod
    def direct_au_loss(u_e, i_e, row_mask, gamma):
        """alignment = E||u - i||^2 (normalized); uniformity =
        log E exp(-2||x - x'||^2) (DirectAU.py:alignment/uniformity)."""
        def norm(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        u, i = norm(u_e), norm(i_e)
        n = jnp.maximum(row_mask.sum(), 1)
        align = (jnp.square(u - i).sum(-1) * row_mask).sum() / n

        def uniformity(x):
            d2 = jnp.square(x[:, None, :] - x[None, :, :]).sum(-1)
            pairs = row_mask[:, None] * row_mask[None, :] \
                * (1 - jnp.eye(x.shape[0]))
            e = jnp.exp(-2.0 * d2) * pairs
            return jnp.log(e.sum() / jnp.maximum(pairs.sum(), 1) + 1e-12)

        return align + gamma * (uniformity(u) + uniformity(i)) / 2


class POPModel(nn.Module):
    """Train-popularity scorer (general/POP.py); run with epoch=0 — the dummy
    parameter exists only so the optimizer has a pytree."""
    popularity: Any  # (n_items,) float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        pop = jnp.asarray(self.popularity)
        return pop[feed["item_id"].astype(jnp.int32)]


class BUIRModel(nn.Module):
    """BUIR (general/BUIR.py): bootstrapped user/item representations —
    online + momentum-target embedding tables and a shared predictor.

    prediction = predictor(i_on)·u_on + predictor(u_on)·i_on (:77-80).
    Training (runner loss_n='BUIR'): symmetric 2 - 2·cos between online
    predictions and stop-gradient targets (:101-114); no negative sampling
    is needed (sampled negatives, if present, are simply unused). After
    every optimizer step the runner applies the momentum update
    t <- m·t + (1-m)·o (:66-71 via BUIRRunner). Run with --l2 0: the
    reference freezes the target tables (requires_grad=False) so they see
    no weight decay either."""
    user_num: int
    item_num: int
    emb_size: int = 64
    momentum: float = 0.995
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        uid = feed["user_id"].astype(jnp.int32)
        iid = feed["item_id"].astype(jnp.int32)
        u_on = embed(self.user_num, self.emb_size, "user_online",
                     self.dtype)(uid)
        i_on = embed(self.item_num, self.emb_size, "item_online",
                     self.dtype)(iid)
        # target tables exist as (gradient-free) params so checkpoints carry
        # them; they must be CALLED for flax to materialize them (lazy init)
        jax.lax.stop_gradient(
            embed(self.user_num, self.emb_size, "user_target",
                  self.dtype)(uid))
        jax.lax.stop_gradient(
            embed(self.item_num, self.emb_size, "item_target",
                  self.dtype)(iid))
        pred = dense(self.emb_size, "predictor", dtype=self.dtype)
        return (pred(i_on) * u_on[:, None, :]).sum(-1) \
            + (pred(u_on)[:, None, :] * i_on).sum(-1)

    @staticmethod
    def buir_loss(params, user_id, item0_id, row_mask, dtype=jnp.float32):
        """Symmetric bootstrap loss over the first (positive) candidate."""
        def norm(x):
            return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

        w = params["predictor"]["kernel"].astype(dtype)
        b = params["predictor"]["bias"].astype(dtype)
        u_on = params["user_online"]["embedding"][user_id] @ w + b
        i_on = params["item_online"]["embedding"][item0_id] @ w + b
        u_t = jax.lax.stop_gradient(
            params["user_target"]["embedding"][user_id])
        i_t = jax.lax.stop_gradient(
            params["item_target"]["embedding"][item0_id])
        loss_ui = 2 - 2 * (norm(u_on) * norm(i_t)).sum(-1)
        loss_iu = 2 - 2 * (norm(i_on) * norm(u_t)).sum(-1)
        n = jnp.maximum(row_mask.sum(), 1)
        return ((loss_ui + loss_iu) * row_mask).sum() / n

    @staticmethod
    def sync_targets(params):
        """Copy online -> target at construction (BUIR.py:52-57
        param_t.data.copy_(param_o.data)); applied by the runner right
        after init."""
        params = dict(params)
        for side in ("user", "item"):
            params[f"{side}_target"] = {
                "embedding": params[f"{side}_online"]["embedding"]}
        return params

    @staticmethod
    def momentum_update(params, momentum: float):
        """t <- m·t + (1-m)·o for both target tables (BUIR.py:66-71)."""
        params = dict(params)
        for side in ("user", "item"):
            o = params[f"{side}_online"]["embedding"]
            t = params[f"{side}_target"]["embedding"]
            params[f"{side}_target"] = {
                "embedding": momentum * t + (1 - momentum) * o}
        return params
