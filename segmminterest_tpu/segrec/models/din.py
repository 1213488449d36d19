"""DIN backbone + ClipDINRec segment integration.

Behavioral spec: /root/reference/SegRec/models/context_seq/DIN.py:22-182 and
ClipDINRec.py:11-261. Quirks kept verbatim:
 * the "attention" is a sigmoid-MLP score per history position, ZEROED (not
   -inf) at padded positions, scaled by 1/sqrt(emb), and used WITHOUT softmax
   (softmax_stag=False) as weights over history (DIN.py:69-103);
 * the DNN head uses Dice activations with an affine pre-BatchNorm
   (batch_norm=True, norm_before_activation=True);
 * ClipDIN scores every (candidate, clip) pair: segment repr runs the same
   DIN attention against the history, then Σ_clip score * interest * mask
   with optional softmax/sigmoid normalization over clips
   (ClipDINRec.py:210-250).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import MLPBlock, dense, embed
from .cliprec import CLIP_NUM


def din_attention(att_mlp, queries, keys, keys_length, *, deterministic):
    """(N, H) queries x (N, L, H) keys -> (N, H) weighted history sum
    (DIN.py:69-103)."""
    N, L, H = keys.shape
    q = jnp.repeat(queries[:, None, :], L, axis=1)
    inp = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
    scores = att_mlp(inp, deterministic=deterministic)[..., 0]  # (N, L)
    mask = jnp.arange(L)[None, :] >= keys_length[:, None]
    scores = jnp.where(mask, 0.0, scores) / jnp.sqrt(
        jnp.asarray(H, jnp.float32)).astype(scores.dtype)
    return jnp.einsum("nl,nlh->nh", scores, keys)


class _EmbedDict(nn.Module):
    """Per-feature embedding dict shared by current and history features
    (DIN.py:47-51)."""
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


class DINModel(nn.Module):
    """DIN (DIN.py:22-182): target attention over the user history per
    candidate, Dice DNN head."""
    user_features: Sequence[str]     # ['user_id'] + u_*
    item_features: Sequence[str]     # ['item_id'] + i_*
    situation_features: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    att_layers: Sequence[int] = (64,)
    dnn_layers: Sequence[int] = (64,)
    # append historical situation embeddings to each history step AND the
    # current situation to each candidate (DIN.py:132-141)
    add_historical_situations: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        ed = _EmbedDict(list(self.user_features) + list(self.item_features)
                        + list(self.situation_features),
                        self.feature_max, self.emb_size, dtype=self.dtype,
                        name="embedding_dict")
        B, I = feed["item_id"].shape
        item_feats_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.item_features], axis=-2)
        history_item_emb = jnp.stack(
            [ed.lookup(f, feed["history_" + f]) for f in self.item_features],
            axis=-2)  # (B, L, n_if, d)
        user_feats_emb = jnp.stack(
            [ed.lookup(f, feed[f]) for f in self.user_features], axis=-2)
        situ_emb = [ed.lookup(f, feed[f]) for f in self.situation_features]

        if self.add_historical_situations and self.situation_features:
            hist_situ = jnp.stack(
                [ed.lookup(f, feed["history_" + f])
                 for f in self.situation_features], axis=-2)
            history_item_emb = jnp.concatenate(
                [history_item_emb, hist_situ], axis=-2)
            cur_situ = jnp.stack(situ_emb, axis=-2)
            item_feats_emb_ext = jnp.concatenate(
                [item_feats_emb,
                 jnp.repeat(cur_situ[:, None], I, axis=1)], axis=-2)
            current_emb = item_feats_emb_ext.reshape(B, I, -1)
        else:
            current_emb = item_feats_emb.reshape(B, I, -1)
        history_emb = history_item_emb.reshape(
            B, history_item_emb.shape[1], -1)
        ctx = [item_feats_emb,
               jnp.repeat(user_feats_emb[:, None], I, axis=1)]
        if situ_emb:
            situ = jnp.stack(situ_emb, axis=-2)
            ctx.append(jnp.repeat(situ[:, None], I, axis=1))
        all_context = jnp.concatenate(ctx, axis=-2).reshape(B, I, -1)

        att_mlp = MLPBlock(self.att_layers, output_dim=1,
                           activation="sigmoid", dropout=self.dropout,
                           dtype=self.dtype, name="att_mlp_layers")
        dnn = MLPBlock(self.dnn_layers, output_dim=1, activation="dice",
                       batch_norm=True, dropout=self.dropout,
                       dtype=self.dtype, name="dnn_mlp_layers")

        L, H = history_emb.shape[1], history_emb.shape[2]
        cur2d = current_emb.reshape(B * I, -1)
        his2d = jnp.repeat(history_emb[:, None], I, axis=1).reshape(B * I, L, H)
        len2d = jnp.repeat(feed["lengths"][:, None], I, axis=1).reshape(-1)
        user_his = din_attention(att_mlp, cur2d, his2d, len2d,
                                 deterministic=deterministic)
        din_in = jnp.concatenate(
            [user_his, user_his * cur2d, all_context.reshape(B * I, -1)], -1)
        out = dnn(din_in, deterministic=deterministic)
        return out[..., 0].reshape(B, I)


class ClipDINModel(nn.Module):
    """ClipDINRec (ClipDINRec.py:11-261): DIN attention per (candidate, clip)
    segment followed by interest-weighted clip integration."""
    feature_max: Dict[str, int]
    has_duration: bool = True
    emb_size: int = 64
    att_layers: Sequence[int] = (64,)
    dnn_layers: Sequence[int] = (64,)
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    norm_interest_type: str = "none"  # softmax | sigmoid | none
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        d = self.emb_size
        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        C = CLIP_NUM

        user_embedding = embed(self.feature_max["user_id"], d,
                               "user_embedding", self.dtype)
        item_embedding = embed(self.feature_max["item_id"], d,
                               "item_embedding", self.dtype)
        item_feature_embedding = dense(d, "item_feature_embedding",
                                       dtype=self.dtype)
        frame_position_embedding = dense(d, "frame_position_embedding",
                                         dtype=self.dtype)
        frame_id_projector = dense(d, "frame_id_projector", dtype=self.dtype)

        # ---- current (per-clip) embedding (ClipDINRec.py:123-151) ----
        item_embed = item_embedding(item_ids)
        item_embed_exp = jnp.repeat(item_embed[:, :, None, :], C, axis=2)
        positions = jnp.broadcast_to(
            jnp.arange(C, dtype=self.dtype)[None, None, :, None], (B, I, C, 1))
        frame_position_embed = frame_position_embedding(positions)
        if self.use_frames:
            frame_embedding = dense(d, "frame_embedding", dtype=self.dtype)
            lines = feed["item_frame_lines"]
            frames = jnp.take(feat_table, jnp.clip(lines, 0), axis=0)
            frames = frames * (lines >= 0)[..., None].astype(frames.dtype)
            frame_feats_embed = nn.relu(frame_embedding(frames))
            frame_id_embed = frame_id_projector(jnp.concatenate(
                [item_embed_exp, frame_position_embed], -1))
            frame_concat = jnp.concatenate([frame_feats_embed, frame_id_embed],
                                           -1)
        else:
            frame_concat = jnp.concatenate(
                [item_embed_exp, frame_position_embed], -1)
        item_feats_emb = frame_id_projector(frame_concat)  # (B, I, C, d)

        history_item_emb = item_embedding(
            feed["history_item_id"].astype(jnp.int32))  # (B, L, d)
        if self.has_duration:
            item_feature_emb = item_feature_embedding(
                feed["i_duration"].astype(self.dtype)[..., None])
            item_feats_emb = jnp.concatenate(
                [item_feats_emb,
                 jnp.repeat(item_feature_emb[:, :, None, :], C, axis=2)], -1)
            history_feature_emb = item_feature_embedding(
                feed["history_i_duration"].astype(self.dtype)[..., None])
            history_item_emb = jnp.concatenate(
                [history_item_emb, history_feature_emb], -1)

        user_embed = user_embedding(feed["user_id"].astype(jnp.int32))
        all_context = jnp.concatenate(
            [item_feats_emb,
             jnp.broadcast_to(user_embed[:, None, None, :],
                              (B, I, C, d))], -1)

        att_mlp = MLPBlock(self.att_layers, output_dim=1,
                           activation="sigmoid", dropout=self.dropout,
                           dtype=self.dtype, name="att_mlp_layers")
        dnn = MLPBlock(self.dnn_layers, output_dim=1, activation="dice",
                       batch_norm=True, dropout=self.dropout,
                       dtype=self.dtype, name="dnn_mlp_layers")

        # ---- per-(item, clip) DIN attention (ClipDINRec.py:186-208) ----
        L, H = history_item_emb.shape[1], history_item_emb.shape[2]
        cur2d = item_feats_emb.reshape(B * I * C, -1)
        his2d = jnp.broadcast_to(history_item_emb[:, None, None],
                                 (B, I, C, L, H)).reshape(B * I * C, L, H)
        len2d = jnp.broadcast_to(feed["lengths"][:, None, None],
                                 (B, I, C)).reshape(-1)
        user_his = din_attention(att_mlp, cur2d, his2d, len2d,
                                 deterministic=deterministic)
        din_in = jnp.concatenate(
            [user_his, user_his * cur2d,
             all_context.reshape(B * I * C, -1)], -1)
        clip_predictions = dnn(din_in, deterministic=deterministic)[..., 0] \
            .reshape(B, I, C)

        # ---- clip integration (ClipDINRec.py:210-250) ----
        if self.adjust_interest_weight:
            w = self.param("trainable_interest_weight",
                           nn.initializers.ones, (C,))
            interest = jnp.broadcast_to(w[None, None, :], (B, I, C))
        elif "c_interest_weight" in feed:
            interest = feed["c_interest_weight"].astype(clip_predictions.dtype)
        else:
            interest = jnp.ones((B, I, C), clip_predictions.dtype)
        if self.duration_mask:
            dur = feed["i_duration"].astype(jnp.int32)
            mask = jnp.arange(C)[None, None, :] < dur[..., None]
        else:
            mask = jnp.ones((B, I, C), bool)
        if self.norm_interest_type == "softmax":
            interest = jax.nn.softmax(
                jnp.where(mask, interest, -jnp.inf), axis=-1)
        elif self.norm_interest_type == "sigmoid":
            interest = jax.nn.sigmoid(interest) * mask
        else:
            interest = interest * mask
        return (clip_predictions * interest).sum(-1)
