"""SDIM + ETA backbones (hash-based long-behavior retrieval).

SDIM spec: SegRec/models/context_seq/SDIM.py:21-160. NOTE: that tree's copy
is unimportable — it does ``from models.context_seq.ETA import *`` but the
SegRec tree has no ETA.py (PARITY.md S4); the ReChorus fork carries both
(SkipPredBaseline/ReChorus/src/models/context_seq/{ETA,SDIM}.py). SDIM here
follows the FuxiCTR SDIM the reference cites (Cao et al., CIKM 2022) and
the surviving code: short-term interest = multi-head target attention over
the ``recent_k`` most recent history items; long-term interest = LSH
collision attention (hash the target and the older history with shared
random rotations; colliding items are mean-pooled); DNN over
[target ++ short ++ long ++ user]. ETA (below) is the top-k-retrieval
sibling from the ReChorus fork.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import MLPBlock, MultiHeadTargetAttention, dense, embed


class SDIMModel(nn.Module):
    user_features: Sequence[str]
    item_features: Sequence[str]
    situation_features: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    dnn_layers: Sequence[int] = (64,)
    attention_dim: int = 64
    num_heads: int = 1
    num_hashes: int = 1
    hash_bits: int = 4
    recent_k: int = 5
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        from .dien import _EmbedDict
        ed = _EmbedDict(list(self.user_features) + list(self.item_features)
                        + list(self.situation_features),
                        self.feature_max, self.emb_size, dtype=self.dtype,
                        name="embedding_dict")
        B, I = feed["item_id"].shape
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

        L, H = history_emb.shape[1], history_emb.shape[2]
        # recency indexing like the reference: index 0 of `indices` is the
        # LAST history slot (SDIM.py:91-96)
        indices = jnp.arange(L - 1, -1, -1)[None, :]
        lens = feed["lengths"][:, None]
        mask_short = (indices < lens) & (indices <= self.recent_k)
        mask_long = (indices < lens) & (indices > self.recent_k)

        # short-term: target attention over recent items
        short_att = MultiHeadTargetAttention(
            input_dim=H, attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="short_attention")
        tgt2d = target_emb.reshape(B * I, H)
        his2d = jnp.repeat(history_emb[:, None], I, axis=1).reshape(B * I, L, H)
        ms2d = jnp.repeat(mask_short[:, None], I, axis=1).reshape(B * I, L)
        short_interest = short_att(tgt2d, his2d, ms2d,
                                   deterministic=deterministic) \
            .reshape(B, I, H)

        # long-term: LSH collision attention (lsh_attention, SDIM.py:107-124)
        rot = self.param("random_rotations",
                         nn.initializers.normal(1.0),
                         (H, self.num_hashes, self.hash_bits))
        powers = 2 ** jnp.arange(self.hash_bits)

        def hash_codes(x):  # (..., H) -> (..., num_hashes) int
            proj = jnp.einsum("...h,hnb->...nb", x, rot.astype(x.dtype))
            return ((proj > 0).astype(jnp.int32) * powers).sum(-1)

        tgt_codes = hash_codes(target_emb)              # (B, I, nh)
        his_codes = hash_codes(history_emb)             # (B, L, nh)
        collide = (tgt_codes[:, :, None, :] == his_codes[:, None, :, :])
        collide = collide & jnp.repeat(mask_long[:, None], I,
                                       axis=1)[..., None]
        w = collide.astype(self.dtype).sum(-1)          # (B, I, L)
        denom = jnp.maximum(w.sum(-1, keepdims=True), 1e-9)
        long_interest = jnp.einsum("bil,blh->bih", w / denom, history_emb)

        inp = jnp.concatenate(
            [target_emb, short_interest, long_interest,
             jnp.repeat(user_emb[:, None], I, axis=1)], -1)
        return MLPBlock(self.dnn_layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="dnn")(
            inp, deterministic=deterministic)[..., 0]


class ETAModel(nn.Module):
    """ETA backbone (SegRec ReChorus fork models/context_seq/ETA.py:30-278).

    Short-term interest: multi-head target attention over the ``recent_k``
    most recent history items (:166-180). Long-term interest: LSH top-k
    retrieval — bucket codes from shared random rotations, similarity =
    MINUS THE ABSOLUTE BUCKET-ID DIFFERENCE summed over hashes (:259, the
    reference's quirk — not hamming distance), masked slots filled with
    -hash_bits, top ``retrieval_k`` gathered and target-attended (:251-266).
    DNN over [short ++ long] only (:198-214; unlike SDIM no raw target/user
    concat).
    """
    user_features: Sequence[str]
    item_features: Sequence[str]
    situation_features: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    dnn_layers: Sequence[int] = (128, 64)
    attention_dim: int = 64
    num_heads: int = 1
    num_hashes: int = 1
    hash_bits: int = 4
    recent_k: int = 5
    retrieval_k: int = 5
    history_max: int = 20
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        from .dien import _EmbedDict
        ed = _EmbedDict(list(self.user_features) + list(self.item_features)
                        + list(self.situation_features),
                        self.feature_max, self.emb_size, dtype=self.dtype,
                        name="embedding_dict")
        B, I = feed["item_id"].shape
        target_emb = ed.lookup("item_id", feed["item_id"])          # (B,I,H)
        history_emb = ed.lookup("item_id", feed["history_item_id"])  # (B,L,H)
        L, H = history_emb.shape[1], history_emb.shape[2]

        indices = jnp.arange(L - 1, -1, -1)[None, :]
        lens = feed["lengths"][:, None]
        mask_short = (indices < lens) & (indices <= self.recent_k)
        mask_long = (indices < lens) & (indices > self.recent_k)

        short_att = MultiHeadTargetAttention(
            input_dim=H, attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="short_attention_0")
        tgt2d = target_emb.reshape(B * I, H)
        his2d = jnp.repeat(history_emb[:, None], I, axis=1).reshape(B * I, L, H)
        ms2d = jnp.repeat(mask_short[:, None], I, axis=1).reshape(B * I, L)
        short_interest = short_att(tgt2d, his2d, ms2d,
                                   deterministic=deterministic) \
            .reshape(B, I, H)

        if self.history_max <= self.recent_k:
            # the reference builds no long-interest branch at all in this
            # configuration (ETA.py:139-141,206-208): DNN input = short only
            return MLPBlock(self.dnn_layers, output_dim=1,
                            dropout=self.dropout, dtype=self.dtype,
                            name="dnn")(short_interest,
                                        deterministic=deterministic)[..., 0]

        # LSH top-k retrieval (topk_retrieval :251-266)
        rot = self.param("random_rotations", nn.initializers.normal(1.0),
                         (H, self.num_hashes, self.hash_bits))
        powers = 2 ** jnp.arange(self.hash_bits)

        def hash_codes(x):
            proj = jnp.einsum("...h,hnb->...nb", x, rot.astype(x.dtype))
            return ((proj > 0).astype(jnp.int32) * powers).sum(-1)

        tgt_codes = hash_codes(target_emb)     # (B, I, nh)
        his_codes = hash_codes(history_emb)    # (B, L, nh)
        sim = -jnp.abs(tgt_codes[:, :, None, :]
                       - his_codes[:, None, :, :]).sum(-1)   # (B, I, L)
        ml = jnp.repeat(mask_long[:, None], I, axis=1)
        sim = jnp.where(ml, sim, -self.hash_bits)
        k = min(self.retrieval_k, L)
        _, topk_idx = jax.lax.top_k(sim, k)                  # (B, I, k)
        topk_emb = jnp.take_along_axis(
            jnp.repeat(history_emb[:, None], I, axis=1),
            topk_idx[..., None], axis=2)                     # (B, I, k, H)
        topk_mask = jnp.take_along_axis(ml, topk_idx, axis=2)

        long_att = MultiHeadTargetAttention(
            input_dim=H, attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="long_attention_0")
        long_interest = long_att(
            tgt2d, topk_emb.reshape(B * I, k, H),
            topk_mask.reshape(B * I, k),
            deterministic=deterministic).reshape(B, I, H)

        inp = jnp.concatenate([short_interest, long_interest], -1)
        return MLPBlock(self.dnn_layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="dnn")(
            inp, deterministic=deterministic)[..., 0]
