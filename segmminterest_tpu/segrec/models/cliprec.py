"""Clip-integrated WideDeep (the Task-2 contribution's base pattern).

Behavioral spec: /root/reference/SegRec/models/context/ClipRec.py:14-198
(ClipRecBase): every candidate video is scored PER SEGMENT — segment repr =
[frame CLIP feature embed ||] (item embed || frame-position embed) — and the
final prediction is sum_seg clip_score * interest_weight * duration_mask,
where interest_weight comes from Task-1 logits (``c_interest_weight``), a
trainable 40-vector (``adjust_interest_weight``), or ones.

TPU notes: frame features arrive as int32 line ids (``item_frame_lines``)
and are gathered from the HBM-resident table inside the forward; the
(B, I, 40, 3*emb) MLP is one big MXU matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import MLPBlock, dense, embed

CLIP_NUM = 40


class ClipScoreMixin:
    """Shared weighting logic (ClipRec.py:159-181)."""

    def integrate_clips(self, clip_predictions, feed, trainable_weight=None):
        B, I, C = clip_predictions.shape
        if trainable_weight is not None:
            interest = jnp.broadcast_to(trainable_weight[None, None, :],
                                        (B, I, C))
        elif "c_interest_weight" in feed:
            interest = feed["c_interest_weight"].astype(clip_predictions.dtype)
        else:
            interest = jnp.ones((B, I, C), clip_predictions.dtype)
        if self.duration_mask:
            dur = feed["i_duration"].astype(jnp.int32)  # (B, I)
            mask = (jnp.arange(C)[None, None, :] < dur[..., None]).astype(
                clip_predictions.dtype)
        else:
            mask = jnp.ones((B, I, C), clip_predictions.dtype)
        return (clip_predictions * interest * mask).sum(-1)


class ClipWDModel(nn.Module, ClipScoreMixin):
    """ClipRecBase / ClipWDRec: wide+deep scoring of each segment
    (ClipRec.py:41-181)."""
    feature_max: Dict[str, int]
    emb_dim: int = 64
    dnn_layers: Sequence[int] = (64,)
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    frame_feature_dim: int = 1024
    use_frames: bool = False   # True when a feature table is wired in
    # auxiliary feats-vs-id alignment (ClipRec.py:183-196,237-271):
    # "ContrastiveLoss" = pair-margin on per-clip embeddings,
    # "infoNCELoss" = item-level InfoNCE over [embed || value] rows.
    # The sowed value is weighted by the runner's auxillary_loss_weight
    # (BaseRunner.py:210-214).
    contrastive: str = ""
    contrastive_margin: float = 1.0
    infonce_tau: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        user_ids = feed["user_id"].astype(jnp.int32)
        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        C = CLIP_NUM
        d = self.emb_dim

        user_embed = embed(self.feature_max["user_id"], d, "user_embedding",
                           self.dtype)(user_ids)
        item_embed = embed(self.feature_max["item_id"], d, "item_embedding",
                           self.dtype)(item_ids)
        positions = jnp.broadcast_to(
            jnp.arange(C, dtype=self.dtype)[None, None, :, None], (B, I, C, 1))
        frame_position_embed = dense(d, "frame_position_embedding",
                                     dtype=self.dtype)(positions)
        item_embed_exp = jnp.repeat(item_embed[:, :, None, :], C, axis=2)

        user_value = embed(self.feature_max["user_id"], 1, "user_linear",
                           self.dtype)(user_ids)
        item_value = embed(self.feature_max["item_id"], 1, "item_linear",
                           self.dtype)(item_ids)
        item_value_exp = jnp.repeat(item_value[:, :, None, :], C, axis=2)
        frame_position_linear = dense(1, "frame_position_linear",
                                      dtype=self.dtype)(positions)

        if self.use_frames:
            lines = feed["item_frame_lines"]  # (B, I, C) int32, -1 padded
            frames = jnp.take(feat_table, jnp.clip(lines, 0), axis=0)
            frames = frames * (lines >= 0)[..., None].astype(frames.dtype)
            frame_feats_embed = nn.relu(
                dense(d, "frame_embedding", dtype=self.dtype)(frames))
            frame_feats_value = nn.relu(
                dense(1, "frame_linear", dtype=self.dtype)(frames))
            frame_id_embed = dense(d, "frame_id_projector", dtype=self.dtype)(
                jnp.concatenate([item_embed_exp, frame_position_embed], -1))
            frame_id_value = dense(1, "frame_id_projector_linear",
                                   dtype=self.dtype)(
                jnp.concatenate([item_value_exp, frame_position_linear], -1))
            frame_concat_embed = jnp.concatenate(
                [frame_feats_embed, frame_id_embed], -1)
            frame_concat_value = jnp.concatenate(
                [frame_feats_value, frame_id_value], -1)
        else:
            frame_concat_embed = jnp.concatenate(
                [item_embed_exp, frame_position_embed], -1)
            frame_concat_value = jnp.concatenate(
                [item_value_exp, frame_position_linear], -1)

        user_exp = jnp.broadcast_to(user_embed[:, None, None, :], (B, I, C, d))
        fm_vectors = jnp.concatenate([user_exp, frame_concat_embed], -1)
        deep_prediction = MLPBlock(self.dnn_layers, output_dim=1,
                                   dropout=self.dropout, dtype=self.dtype,
                                   name="dnn_mlp_layers")(
            fm_vectors, deterministic=deterministic).squeeze(-1)

        user_value_exp = jnp.broadcast_to(user_value[:, None, None, :],
                                          (B, I, C, 1))
        linear_value = jnp.concatenate([user_value_exp, frame_concat_value], -1)
        overall_bias = self.param("overall_bias",
                                  nn.initializers.constant(0.01), (1,))
        wide_prediction = overall_bias + linear_value.sum(-1)

        clip_predictions = deep_prediction + wide_prediction
        trainable = None
        if self.adjust_interest_weight:
            trainable = self.param("trainable_interest_weight",
                                   nn.initializers.ones, (C,))

        if self.contrastive and self.use_frames:
            if self.contrastive == "ContrastiveLoss":
                # all-positive pair-margin loss: labels are ones, so only
                # the 0.5*mean(||e1-e2||^2) term survives (ClipRec.py:238-247)
                diff = (frame_feats_embed - frame_id_embed).reshape(-1, d)
                aux = 0.5 * (diff ** 2).sum(-1).mean()
            elif self.contrastive == "infoNCELoss":
                # item-level InfoNCE over [embed || value] rows
                # (ClipRec.py:249-271)
                e = jnp.concatenate(
                    [frame_feats_embed.reshape(B * I, C * d),
                     frame_feats_value.reshape(B * I, C)], axis=1)
                g = jnp.concatenate(
                    [frame_id_embed.reshape(B * I, C * d),
                     frame_id_value.reshape(B * I, C)], axis=1)
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
                g = g / jnp.maximum(
                    jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
                logits = (e @ g.T) / self.infonce_tau
                n = logits.shape[0]
                eye = jnp.eye(n, dtype=logits.dtype)
                exp = jnp.exp(logits)
                pos = (exp * eye).sum(1)
                neg = (exp * (1 - eye)).sum(1)
                aux = (-jnp.log(pos / (pos + neg))).mean()
            else:
                raise ValueError(f"unknown contrastive {self.contrastive!r}")
            self.sow("losses", "contrastive_loss", aux)

        return self.integrate_clips(clip_predictions, feed, trainable)
