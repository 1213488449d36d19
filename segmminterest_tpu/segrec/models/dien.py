"""DIEN backbone (SegRec/models/context_seq/DIEN.py:19-260).

Interest extractor GRU over the history, target attention, and an
attention-modulated evolving GRU (AUGRU/AGRU/AIGRU). Implemented with
lax.scan cells; packed-sequence semantics are reproduced with length masks
(the carry freezes beyond each row's length, so the final hidden equals
torch's packed output).

Quirks replicated (see PARITY.md):
 * target_attention softmax runs over the flattened BATCH axis, not the
   history axis (DIEN.py:118-124, softmax(dim=-2)); padded batch rows are
   excluded via -inf so results match the reference's ragged batches;
 * the reference maps gru_type "AGRU" to the AUGRU cell (DIEN.py:DynamicGRU).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import MLPBlock, dense, embed

RANDN = nn.initializers.normal(stddev=1.0)


class _EmbedDict(nn.Module):
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    vec_size: int
    dtype: Any = jnp.float32

    def setup(self):
        layers = {}
        for f in self.feature_names:
            if f.endswith("_c") or f.endswith("_id"):
                layers[f] = embed(self.feature_max[f], self.vec_size,
                                  f"emb_{f}", self.dtype)
            else:
                layers[f] = dense(self.vec_size, f"emb_{f}", use_bias=False,
                                  dtype=self.dtype)
        self.layers = layers

    def lookup(self, f, x):
        if f.endswith("_c") or f.endswith("_id"):
            return self.layers[f](x.astype(jnp.int32))
        return self.layers[f](x.astype(self.dtype)[..., None])


class _GRUStep(nn.Module):
    """One masked GRU/AUGRU step, lifted over the time axis via nn.scan.
    torch gate layout (x2h/h2h, r/z/n or u/r/n for AUGRU); the carry freezes
    at t >= length (packed-sequence semantics), outputs are zero there."""
    hidden: int
    cell_type: str = "gru"   # gru | augru
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, inputs):
        x, valid, attn = inputs
        gx = dense(3 * self.hidden, "x2h", dtype=self.dtype)(x)
        gh = dense(3 * self.hidden, "h2h", dtype=self.dtype)(h)
        if self.cell_type == "augru":
            xu, xr, xn = jnp.split(gx, 3, -1)
            hu, hr, hn = jnp.split(gh, 3, -1)
            u = jax.nn.sigmoid(xu + hu) * attn[:, None]
            r = jax.nn.sigmoid(xr + hr)
            n = jnp.tanh(xn + r * hn)
            h_new = h + u * (n - h)
        else:
            xr, xz, xn = jnp.split(gx, 3, -1)
            hr, hz, hn = jnp.split(gh, 3, -1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
        v = valid[:, None]
        return jnp.where(v, h_new, h), jnp.where(v, h_new, 0.0)


class MaskedGRU(nn.Module):
    """GRU/AUGRU over (N, L, D) with per-row lengths -> (outputs, last_h)."""
    hidden: int
    cell_type: str = "gru"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, attn=None):
        N, L, _ = xs.shape
        valid = jnp.arange(L)[None, :] < lengths[:, None]
        if attn is None:
            attn = jnp.zeros((N, L), xs.dtype)
        scan = nn.scan(_GRUStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        h0 = jnp.zeros((N, self.hidden), xs.dtype)
        last_h, outs = scan(hidden=self.hidden, cell_type=self.cell_type,
                            dtype=self.dtype, name="cell")(
            h0, (xs, valid, attn))
        return outs, last_h


class DIENModel(nn.Module):
    user_features: Sequence[str]
    item_features: Sequence[str]
    situation_features: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    evolving_gru_type: str = "AGRU"   # AGRU | AUGRU | AIGRU
    fcn_hidden_layers: Sequence[int] = (64,)
    aux_hidden_layers: Sequence[int] = (64,)
    alpha_aux: float = 0.0
    # append situation embeddings to each history step and each candidate
    # (DIEN.py:52 via DINBase.get_all_embedding, DIN.py:132-141)
    add_historical_situations: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def _gru_emb_size(self):
        n = len(self.item_features)
        if self.add_historical_situations:
            n += len(self.situation_features)
        return self.emb_size * n

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True,
                 return_aux: bool = False):
        ed = _EmbedDict(list(self.user_features) + list(self.item_features)
                        + list(self.situation_features),
                        self.feature_max, self.emb_size, dtype=self.dtype,
                        name="embedding_dict")
        B, I = feed["item_id"].shape
        hislens = feed["lengths"]
        target_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.item_features],
            axis=-2)
        history_emb = jnp.stack(
            [ed.lookup(f, feed["history_" + f]) for f in self.item_features],
            axis=-2)
        hist_situs = (self.add_historical_situations
                      and bool(self.situation_features))
        if hist_situs:
            cur_situ = jnp.stack(
                [ed.lookup(f, feed[f]) for f in self.situation_features],
                axis=-2)
            target_emb = jnp.concatenate(
                [target_emb, jnp.repeat(cur_situ[:, None], I, axis=1)],
                axis=-2)
            history_emb = jnp.concatenate(
                [history_emb,
                 jnp.stack([ed.lookup(f, feed["history_" + f])
                            for f in self.situation_features], axis=-2)],
                axis=-2)
        target_emb = target_emb.reshape(B, I, -1)
        history_emb = history_emb.reshape(B, history_emb.shape[1], -1)
        user_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.user_features],
            axis=-2).reshape(B, -1)
        # the reference keeps the situation context in the FCN input even
        # when it is also appended to history/target (get_all_embeddings'
        # ``else None`` arm at DIEN.py:93-94 is unreachable dead code)
        situ_emb = None
        if self.situation_features:
            situ_emb = jnp.stack(
                [ed.lookup(f, feed[f]) for f in self.situation_features],
                axis=-2).reshape(B, -1)

        gsz = self._gru_emb_size()
        gru = MaskedGRU(gsz, dtype=self.dtype, name="gru")
        attentionW = self.param("attentionW", RANDN, (gsz, gsz))

        L = history_emb.shape[1]
        his2d = jnp.repeat(history_emb[:, None], I, axis=1) \
            .reshape(B * I, L, gsz)
        len2d = jnp.repeat(hislens[:, None], I, axis=1).reshape(-1)
        tgt2d = target_emb.reshape(B * I, gsz)
        row_mask2d = jnp.repeat(feed["row_mask"][:, None], I,
                                axis=1).reshape(-1)

        interest_emb, _ = gru(his2d, len2d)

        # target attention with the reference's batch-axis softmax
        prod = jnp.einsum("nlh,hk,nk->nl",
                          interest_emb, attentionW.astype(self.dtype), tgt2d)
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
        inp = jnp.concatenate(parts, -1)
        predictions = MLPBlock(self.fcn_hidden_layers, output_dim=1,
                               dropout=self.dropout, dtype=self.dtype,
                               name="fcn_net")(
            inp, deterministic=deterministic)[..., 0]

        if self.alpha_aux > 0 and (return_aux or not deterministic
                                   or self.is_initializing()):
            # auxiliary next-item BCE added to the training loss with weight
            # alpha_aux (DIEN.py:143,174-192); sown pre-weighted so the
            # runner adds it as-is
            aux = self._aux_loss(feed, ed, interest_emb.reshape(
                B, I, L, gsz)[:, 0], history_emb, hislens, deterministic)
            if return_aux:
                return predictions, aux
            self.sow("losses", "aux_loss", self.alpha_aux * aux)
        return predictions

    def _aux_loss(self, feed, ed, interest_emb, pos_emb, lengths,
                  deterministic):
        """Auxiliary next-item BCE (DIEN.py:174-192); requires
        history_neg_item_id in the feed."""
        neg_emb = jnp.stack(
            [ed.lookup(f, feed["history_neg_" + f]) if
             ("history_neg_" + f) in feed else
             ed.lookup(f, feed["history_" + f])
             for f in self.item_features], axis=-2)
        if self.add_historical_situations and self.situation_features:
            # neg items keep the POSITIVE history's situations
            # (DIEN.py:100-104)
            neg_emb = jnp.concatenate(
                [neg_emb,
                 jnp.stack([ed.lookup(f, feed["history_" + f])
                            for f in self.situation_features], axis=-2)],
                axis=-2)
        neg_emb = neg_emb.reshape(neg_emb.shape[0], neg_emb.shape[1], -1)
        aux_net = MLPBlock(self.aux_hidden_layers, output_dim=1,
                           dropout=self.dropout, dtype=self.dtype,
                           name="aux_net")
        B, L, E = interest_emb.shape
        pos_in = jnp.concatenate([interest_emb[:, :-1], pos_emb[:, 1:]], -1)
        neg_in = jnp.concatenate([interest_emb[:, :-1], neg_emb[:, 1:]], -1)
        pos_p = jax.nn.sigmoid(aux_net(pos_in,
                                       deterministic=deterministic))[..., 0]
        neg_p = jax.nn.sigmoid(aux_net(neg_in,
                                       deterministic=deterministic))[..., 0]
        pad = (jnp.arange(L)[None, :] < lengths[:, None])[:, 1:]
        eps = 1e-12
        ce_pos = -jnp.log(jnp.clip(pos_p, eps, 1.0))
        ce_neg = -jnp.log(jnp.clip(1 - neg_p, eps, 1.0))
        per_row = ((ce_pos + ce_neg) * pad).sum(-1) / (pad.sum(-1) + 1e-9)
        return per_row.mean()
