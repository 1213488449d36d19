"""CAN backbone (SegRec/models/context_seq/CAN.py:18-230): DIEN plus
co-action micro-MLPs whose weights are induced from a large per-item
embedding (the candidate item parameterizes a tiny MLP applied to the user /
history embeddings)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..layers import embed
from .dien import DIENModel


def co_action(induction, feed_orders, co_action_layers, activation=jnp.tanh):
    """Micro-MLP parameterized by the induction vector (CAN.py:100-124).
    induction: (B, I, V); feed_orders: (B, 1, P) -> (B, I, sum(layers))."""
    B, I, _ = induction.shape
    pre = feed_orders.shape[-1]
    start = 0
    hidden = jnp.repeat(feed_orders, I, axis=1)[:, :, None, :]  # (B, I, 1, P)
    outputs = []
    for layer in co_action_layers:
        w = induction[:, :, start:start + pre * layer].reshape(
            B, I, pre, layer)
        start += pre * layer
        b = induction[:, :, start:start + layer]
        start += layer
        hidden = activation(hidden @ w + b[:, :, None, :])
        outputs.append(hidden[:, :, 0, :])
        pre = layer
    return jnp.concatenate(outputs, -1)


def co_action_history(induction, feed_orders, mask, co_action_layers,
                      activation=jnp.tanh):
    """History variant: mean over valid history steps (CAN.py:126-155).
    feed_orders: (B, L, P); mask: (B, L) bool."""
    B, I, _ = induction.shape
    L = feed_orders.shape[1]
    pre = feed_orders.shape[-1]
    start = 0
    hidden = jnp.repeat(feed_orders[:, :, None, :], I, axis=2)[:, :, :, None, :]
    outputs = []
    maskf = mask.astype(feed_orders.dtype)
    denom = jnp.maximum(maskf.sum(-1), 1e-9)[:, None, None]
    for layer in co_action_layers:
        w = induction[:, :, start:start + pre * layer].reshape(
            B, I, pre, layer)
        start += pre * layer
        b = induction[:, :, start:start + layer]
        start += layer
        hidden = activation(hidden @ w[:, None] + b[:, None, :, None, :])
        out = (hidden[:, :, :, 0, :]
               * maskf[:, :, None, None]).sum(1) / denom
        outputs.append(out)
        pre = layer
    return jnp.concatenate(outputs, -1)


class CANModel(DIENModel):
    induce_vec_size: int = 512
    orders: int = 1
    co_action_layers: Sequence[int] = (4, 4)

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True,
                 return_aux: bool = False):
        # required induction size (CAN.py:34-44)
        pre = self.emb_size * self.orders
        need = 0
        for layer in self.co_action_layers:
            need += pre * layer + layer
            pre = layer
        induce_size = max(self.induce_vec_size, need)

        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        induction = embed(self.feature_max["item_id"], induce_size,
                          "item_embedding_induce", self.dtype)(item_ids)

        ed_user = embed(self.feature_max["user_id"], self.emb_size,
                        "can_user_emb", self.dtype)
        ed_item = embed(self.feature_max["item_id"], self.emb_size,
                        "can_item_emb", self.dtype)
        user_emb = ed_user(feed["user_id"].astype(jnp.int32))[:, None, :]
        his_emb = ed_item(feed["history_item_id"].astype(jnp.int32))

        def orders_cat(x):
            return jnp.concatenate([x ** (i + 1) for i in range(self.orders)],
                                   -1)

        ui = co_action(induction, orders_cat(user_emb),
                       self.co_action_layers)
        L = feed["history_item_id"].shape[1]
        mask = jnp.arange(L)[None, :] < feed["lengths"][:, None]
        hi = co_action_history(induction, orders_cat(his_emb), mask,
                               self.co_action_layers)

        # the reference feeds fcn_net with [ui_coaction, (ci_coaction),
        # his_coaction, dien_inp] (CAN.py:88-96); situation co-action is the
        # empty-situation branch for the SegMM datasets
        return self._can_forward(feed, ui, hi, deterministic=deterministic)

    def _can_forward(self, feed, ui, hi, *, deterministic):
        """DIEN trunk with the co-action features appended to the fcn input
        (CAN.py:55-98)."""
        from .dien import _EmbedDict, MaskedGRU
        from ..layers import MLPBlock
        import jax

        ed = _EmbedDict(list(self.user_features) + list(self.item_features)
                        + list(self.situation_features),
                        self.feature_max, self.emb_size, dtype=self.dtype,
                        name="embedding_dict")
        B, I = feed["item_id"].shape
        hislens = feed["lengths"]
        target_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.item_features],
            axis=-2).reshape(B, I, -1)
        history_emb = jnp.stack(
            [ed.lookup(f, feed["history_" + f]) for f in self.item_features],
            axis=-2)
        history_emb = history_emb.reshape(B, history_emb.shape[1], -1)
        user_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.user_features],
            axis=-2).reshape(B, -1)
        situ_emb = None
        if self.situation_features:
            situ_emb = jnp.stack(
                [ed.lookup(f, feed[f]) for f in self.situation_features],
                axis=-2).reshape(B, -1)

        gsz = self.emb_size * len(self.item_features)
        gru = MaskedGRU(gsz, dtype=self.dtype, name="gru")
        attentionW = self.param(
            "attentionW", nn.initializers.normal(1.0), (gsz, gsz))
        L = history_emb.shape[1]
        his2d = jnp.repeat(history_emb[:, None], I, axis=1) \
            .reshape(B * I, L, gsz)
        len2d = jnp.repeat(hislens[:, None], I, axis=1).reshape(-1)
        tgt2d = target_emb.reshape(B * I, gsz)
        row_mask2d = jnp.repeat(feed["row_mask"][:, None], I,
                                axis=1).reshape(-1)
        interest_emb, _ = gru(his2d, len2d)
        prod = jnp.einsum("nlh,hk,nk->nl", interest_emb,
                          attentionW.astype(self.dtype), tgt2d)
        prod = jnp.where(row_mask2d[:, None], prod, -jnp.inf)
        attention = jax.nn.softmax(prod.astype(jnp.float32),
                                   axis=0).astype(self.dtype)
        if self.evolving_gru_type == "AIGRU":
            gru2 = MaskedGRU(gsz, dtype=self.dtype, name="evolving_gru")
            _, h_out = gru2(interest_emb * attention[..., None], len2d)
        else:
            augru = MaskedGRU(gsz, cell_type="augru", dtype=self.dtype,
                              name="evolving_gru")
            _, h_out = augru(interest_emb, len2d, attn=attention)
        h_out = h_out.reshape(B, I, gsz)
        history_sum = history_emb.sum(-2)
        parts = [jnp.repeat(user_emb[:, None], I, axis=1)]
        if situ_emb is not None:
            parts.append(jnp.repeat(situ_emb[:, None], I, axis=1))
        parts += [target_emb,
                  jnp.repeat(history_sum[:, None], I, axis=1),
                  target_emb * history_sum[:, None],
                  h_out]
        dien_inp = jnp.concatenate(parts, -1)
        all_coaction = jnp.concatenate([ui, hi, dien_inp], -1)
        predictions = MLPBlock(self.fcn_hidden_layers, output_dim=1,
                               dropout=self.dropout, dtype=self.dtype,
                               name="fcn_net")(
            all_coaction, deterministic=deterministic)[..., 0]
        if self.alpha_aux > 0 and (not deterministic
                                   or self.is_initializing()):
            # same auxiliary next-item BCE as DIEN (CAN inherits it,
            # CAN.py:100-104), sown pre-weighted
            aux = self._aux_loss(feed, ed, interest_emb.reshape(
                B, I, L, gsz)[:, 0], history_emb, hislens, deterministic)
            self.sow("losses", "aux_loss", self.alpha_aux * aux)
        return predictions
