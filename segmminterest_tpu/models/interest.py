"""Segment-interest model: SegFormerX backbone(s) + fusion head + loss zoo.

Behavioral spec: /root/reference/MMinterest/models/decoder_leave_focal.py
(MultiScaleTemporalDetrLeaveFocal :425-658, InteractionAggregation :392-423).

A ``SegInterestModel`` produces per-segment interest *logits* (B, 40); the
survival chain and loss zoo live in :mod:`.losses` as pure functions so the
same logits path serves train, eval and the Task-2 logit export.

Fusion heads (selected by ``fusion_heads``, reference :459-471,624-636):
  -3 : add the two backbones' state lists elementwise, Dense(d -> 1)
       (with output_layers=[-1] both -3 and -2 reduce to last-state add)
  -2 : add last states, Dense(d -> 1)
  -1 : concat last states, Dense(2d -> 1)
   0 : Dense(d -> 1) per backbone, summed
  >=1: InteractionAggregation bilinear fusion with that many heads
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .segformerx import SegFormerX
from . import losses as L

XAVIER_UNIFORM = nn.initializers.xavier_uniform()
# torch's xavier_normal_ is a plain (non-truncated) normal with
# std = sqrt(2 / (fan_in + fan_out)); jax's glorot_normal truncates, so use
# variance_scaling with the plain normal distribution for parity.
XAVIER_NORMAL = nn.initializers.variance_scaling(1.0, "fan_avg", "normal")


class InteractionAggregation(nn.Module):
    """Bilinear two-stream aggregation head (decoder_leave_focal.py:392-423,
    itself FinalMLP's InteractionAggregation). x, y: (B, I, D) -> (B, I)."""
    x_dim: int
    y_dim: int
    output_dim: int = 1
    num_heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        # works over arbitrary leading dims: (B, I, D) in the interest model,
        # (B, I, C, D) in ClipFinalMLPRec (ClipFinalMLPRec.py:277-303)
        lead = x.shape[:-1]
        out = nn.Dense(self.output_dim, kernel_init=XAVIER_UNIFORM,
                       dtype=self.dtype, name="w_x")(x) \
            + nn.Dense(self.output_dim, kernel_init=XAVIER_UNIFORM,
                       dtype=self.dtype, name="w_y")(y)
        if self.num_heads > 0:
            hx = self.x_dim // self.num_heads
            hy = self.y_dim // self.num_heads
            w_xy = self.param("w_xy", XAVIER_NORMAL,
                              (self.num_heads * hx * hy, self.output_dim))
            head_x = x.reshape(lead + (self.num_heads, hx))
            head_y = y.reshape(lead + (self.num_heads, hy))
            w_xy = w_xy.astype(x.dtype)
            w = w_xy.reshape(self.num_heads, hx, hy * self.output_dim)
            # xy[..., h, o] = sum_{p,q} x[..., h, p] W[h,p,q,o] y[..., h, q]
            tmp = jnp.einsum("...hp,hpz->...hz", head_x, w)
            tmp = tmp.reshape(lead + (self.num_heads, hy, self.output_dim))
            xy = jnp.einsum("...hqo,...hq->...o", tmp, head_y)
            out = out + xy
        return out.squeeze(-1) if self.output_dim == 1 else out


class SegInterestModel(nn.Module):
    """Single- or dual-backbone interest model producing (B, 40) logits."""
    d_model: int
    num_heads: int
    num_layers: int
    ff_dim: int
    n_users: int
    n_items: int
    max_vid_len: int = 40
    max_usr_len_image: int = 100
    dropout: float = 0.1
    user_input: str = "both"    # id | image | both
    photo_input: str = "both"   # id | image | both
    fusion_heads: int = 2
    learnable_bias: bool = False
    use_pe: bool = True
    ablation: str = "ours"
    dtype: Any = jnp.float32
    remat: bool = False
    remat_scope: str = "layer"
    fused_attention: bool = False
    interpret: bool = False
    fuse_projections: bool = False
    fuse_qkv: bool = False
    fuse_dual: bool = False
    fuse_layer: bool = False

    def setup(self):
        dual = (self.user_input == "both") or (self.photo_input == "both")
        u1_id = -1 if self.user_input in ("both", "image") else self.n_users
        u1_len = 1 if u1_id >= 0 else self.max_usr_len_image
        v1_id = -1 if self.photo_input in ("both", "image") else self.n_items

        def make_backbone(user_id_max, max_usr_len, video_id_max, name):
            return SegFormerX(
                d_model=self.d_model, num_heads=self.num_heads,
                num_layers=self.num_layers, ff_dim=self.ff_dim,
                max_vid_len=self.max_vid_len, max_usr_len=max_usr_len,
                dropout=self.dropout, user_id_max=user_id_max,
                video_id_max=video_id_max, use_pe=self.use_pe,
                ablation=self.ablation, output_layers=[-1],
                dtype=self.dtype, remat=self.remat,
                remat_scope=self.remat_scope,
                fused_attention=self.fused_attention,
                interpret=self.interpret,
                fuse_projections=self.fuse_projections,
                fuse_qkv=self.fuse_qkv, fuse_dual=self.fuse_dual,
                fuse_layer=self.fuse_layer,
                name=name)

        self.backbone1 = make_backbone(u1_id, u1_len, v1_id, "backbone1")
        self.dual = dual
        if dual:
            u2_id = -1 if self.user_input == "image" else self.n_users
            u2_len = self.max_usr_len_image if u2_id < 0 else 1
            v2_id = -1 if self.photo_input == "image" else self.n_items
            self.backbone2 = make_backbone(u2_id, u2_len, v2_id, "backbone2")
            if self.fusion_heads in (-3, -2, 0):
                self.stage_mlp1 = nn.Dense(1, kernel_init=XAVIER_UNIFORM,
                                           dtype=self.dtype, name="stage_mlp1")
                if self.fusion_heads == 0:
                    self.stage_mlp2 = nn.Dense(1, kernel_init=XAVIER_UNIFORM,
                                               dtype=self.dtype,
                                               name="stage_mlp2")
            elif self.fusion_heads == -1:
                self.stage_mlp1 = nn.Dense(1, kernel_init=XAVIER_UNIFORM,
                                           dtype=self.dtype, name="stage_mlp1")
            else:
                self.fusion_module = InteractionAggregation(
                    x_dim=self.d_model, y_dim=self.d_model, output_dim=1,
                    num_heads=self.fusion_heads, dtype=self.dtype,
                    name="fusion_module")
        else:
            self.stage_mlp1 = nn.Dense(1, kernel_init=XAVIER_UNIFORM,
                                       dtype=self.dtype, name="stage_mlp1")
        if self.learnable_bias:
            self.bias_weight = self.param(
                "bias_weight", nn.initializers.ones, (1, self.max_vid_len))
            self.bias_bias = self.param(
                "bias_bias", nn.initializers.ones, (1, self.max_vid_len))

    def _positional_bias(self, bsz):
        """(pos + 1) * w + b, broadcast over batch (reference :496-504)."""
        pos = jnp.arange(self.max_vid_len, dtype=self.dtype)
        bias = (pos[None, :] + 1.0) * self.bias_weight + self.bias_bias
        return jnp.broadcast_to(bias, (bsz, self.max_vid_len))

    def __call__(self, usr_image, usr_id, usr_mask, vid_image, vid_id,
                 vid_mask, *, deterministic: bool = True):
        """Returns per-segment interest logits (B, max_vid_len), with the
        learnable positional bias already added (reference :574-658).

        Input routing per modality config (reference :584-636):
          both : backbone1 gets the image stream, backbone2 the id stream.
          id   : both backbones (or the single one) get ids.
          image: both get images.
        """
        if self.dual:
            usr1 = usr_image if self.user_input in ("both", "image") else usr_id
            usr2 = usr_id if self.user_input in ("both", "id") else usr_image
            vid1 = vid_image if self.photo_input in ("both", "image") else vid_id
            vid2 = vid_id if self.photo_input in ("both", "id") else vid_image
            states1, _ = self.backbone1(usr1, usr_mask, vid1, vid_mask,
                                        deterministic=deterministic)
            states2, _ = self.backbone2(usr2, usr_mask, vid2, vid_mask,
                                        deterministic=deterministic)
            s1, s2 = states1[-1], states2[-1]
            if self.fusion_heads in (-3, -2):
                logits = self.stage_mlp1(s1 + s2).squeeze(-1)
            elif self.fusion_heads == -1:
                logits = self.stage_mlp1(
                    jnp.concatenate([s1, s2], axis=-1)).squeeze(-1)
            elif self.fusion_heads == 0:
                logits = (self.stage_mlp1(s1) + self.stage_mlp2(s2)).squeeze(-1)
            else:
                logits = self.fusion_module(s1, s2)
        else:
            usr = usr_id if self.user_input == "id" else usr_image
            vid = vid_id if self.photo_input == "id" else vid_image
            states, _ = self.backbone1(usr, usr_mask, vid, vid_mask,
                                       deterministic=deterministic)
            logits = self.stage_mlp1(states[-1]).squeeze(-1)

        if self.learnable_bias:
            logits = logits + self._positional_bias(logits.shape[0])
        return logits


def model_loss(logits, gt, row_mask, exposure_prob, loss_types,
               loss_weights, mask_loss=False) -> Dict[str, jax.Array]:
    """Convenience wrapper pairing the logits path with the loss zoo."""
    return L.compute_loss_dict(logits, gt, row_mask, exposure_prob,
                               loss_types, loss_weights, mask_loss)
