"""Clip-integrated backbone variants.

Behavioral spec: /root/reference/SegRec/models/context/
{ClipDCNv2Rec,ClipAutoIntRec,ClipFinalMLPRec,ClipAdaGINRec}.py and
context_seq/{ClipCANRec,ClipDIENRec}.py. Shared pattern: build per-clip
segment context [user_emb ++ frame_concat_embed] of shape (B, I, 40, .),
run the backbone's interaction machinery with the clip axis as an extra
batch dim, then sum clip scores * interest weights * duration mask
(the `_clip_integret_Rec_*` methods).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...models.interest import InteractionAggregation
from ..layers import MLPBlock, dense, embed
from .cliprec import CLIP_NUM, ClipScoreMixin
from .adagin import AutoGraphLayer
from .autoint import _FeatureSelfAttention
from .dcn import RANDN
from .finalmlp import FeatureSelection


class ClipSegmentEmbedder(nn.Module):
    """user embed + per-clip frame repr (item embed ++ position embed
    [++ frame CLIP features]) — the shared `_get_embeddings_Clip*` helper."""
    feature_max: Dict[str, int]
    emb_dim: int
    use_frames: bool = False
    project_frame_id: bool = False  # project (item||pos) down to emb_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, feat_table=None):
        d = self.emb_dim
        user_ids = feed["user_id"].astype(jnp.int32)
        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        C = CLIP_NUM
        user_embed = embed(self.feature_max["user_id"], d, "user_embedding",
                           self.dtype)(user_ids)
        item_embed = embed(self.feature_max["item_id"], d, "item_embedding",
                           self.dtype)(item_ids)
        item_embed_exp = jnp.repeat(item_embed[:, :, None, :], C, axis=2)
        positions = jnp.broadcast_to(
            jnp.arange(C, dtype=self.dtype)[None, None, :, None], (B, I, C, 1))
        pos_embed = dense(d, "frame_position_embedding",
                          dtype=self.dtype)(positions)
        frame_id = jnp.concatenate([item_embed_exp, pos_embed], -1)
        if self.project_frame_id or self.use_frames:
            frame_id = dense(d, "frame_id_projector",
                             dtype=self.dtype)(frame_id)
        if self.use_frames:
            lines = feed["item_frame_lines"]
            frames = jnp.take(feat_table, jnp.clip(lines, 0), axis=0)
            frames = frames * (lines >= 0)[..., None].astype(frames.dtype)
            frame_feats = nn.relu(dense(d, "frame_embedding",
                                        dtype=self.dtype)(frames))
            frame_concat = jnp.concatenate([frame_feats, frame_id], -1)
        else:
            frame_concat = frame_id
        user_exp = jnp.broadcast_to(
            user_embed[:, None, None, :], (B, I, C, d))
        return user_exp, frame_concat


class ClipDCNv2Model(nn.Module, ClipScoreMixin):
    """ClipDCNv2Rec.py:246-277: DCNv2 cross network over per-clip context."""
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    cross_layer_num: int = 6
    # reference default is the mixed low-rank expert cross
    # (ClipDCNv2Rec.py:31,125-169); the full-matrix variant adds
    # reg_weight * sum||W||_2 (:298-303), sown as 'reg_loss'
    mixed: bool = True
    structure: str = "parallel"
    expert_num: int = 2
    low_rank: int = 64
    reg_weight: float = 2.0
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, self.emb_size, use_frames=self.use_frames,
            dtype=self.dtype, name="seg_embedder")(feed, feat_table)
        x0 = jnp.concatenate([user_exp, frame_concat], -1)  # (B, I, C, p)
        pre = x0.shape[-1]
        xl = x0
        if self.mixed:
            gates = [dense(1, f"gating_{e}", dtype=self.dtype)
                     for e in range(self.expert_num)]
            for l in range(self.cross_layer_num):
                U = self.param(f"cross_u_{l}", RANDN,
                               (self.expert_num, pre, self.low_rank))
                V = self.param(f"cross_v_{l}", RANDN,
                               (self.expert_num, pre, self.low_rank))
                Cm = self.param(f"cross_c_{l}", RANDN,
                                (self.expert_num, self.low_rank,
                                 self.low_rank))
                bias = self.param(f"cross_bias_{l}",
                                  nn.initializers.zeros, (pre,))
                expert_outs, gate_scores = [], []
                for e in range(self.expert_num):
                    gate_scores.append(gates[e](xl))        # (B, I, C, 1)
                    v = jnp.tanh(jnp.einsum("bicp,pr->bicr", xl, V[e]))
                    c = jnp.tanh(jnp.einsum("bicr,rs->bics", v, Cm[e]))
                    u = jnp.einsum("bics,ps->bicp", c, U[e]) + bias
                    expert_outs.append(x0 * u)
                experts = jnp.stack(expert_outs, -1)        # (B, I, C, p, E)
                gate = jax.nn.softmax(
                    jnp.concatenate(gate_scores, -1), axis=-1)
                xl = jnp.einsum("bicpe,bice->bicp", experts, gate) + xl
        else:
            reg = 0.0
            for l in range(self.cross_layer_num):
                W = self.param(f"cross_w2_{l}", RANDN, (pre, pre))
                bias = self.param(f"cross_bias_{l}", nn.initializers.zeros,
                                  (pre,))
                xl = x0 * (jnp.einsum("pq,bicq->bicp", W, xl) + bias) + xl
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
        clip_predictions = out[..., 0]
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        return self.integrate_clips(clip_predictions, feed, trainable)


class ClipAutoIntModel(nn.Module, ClipScoreMixin):
    """ClipAutoIntRec.py: AutoInt self-attention over the per-clip feature
    tokens + wide linear term."""
    feature_max: Dict[str, int]
    emb_size: int = 64
    attention_size: int = 32
    num_heads: int = 1
    num_layers: int = 1
    layers: Sequence[int] = (64,)
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        d = self.emb_size
        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, d, use_frames=self.use_frames,
            project_frame_id=False, dtype=self.dtype,
            name="seg_embedder")(feed, feat_table)
        # wide half (reuses the ClipWD linear embeddings, ClipAutoIntRec)
        user_ids = feed["user_id"].astype(jnp.int32)
        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        C = CLIP_NUM
        user_value = embed(self.feature_max["user_id"], 1, "user_linear",
                           self.dtype)(user_ids)
        item_value = embed(self.feature_max["item_id"], 1, "item_linear",
                           self.dtype)(item_ids)
        positions = jnp.broadcast_to(
            jnp.arange(C, dtype=self.dtype)[None, None, :, None], (B, I, C, 1))
        pos_value = dense(1, "frame_position_linear",
                          dtype=self.dtype)(positions)
        linear_value = jnp.concatenate(
            [jnp.broadcast_to(user_value[:, None, None, :], (B, I, C, 1)),
             jnp.repeat(item_value[:, :, None, :], C, axis=2), pos_value], -1)
        overall_bias = self.param("overall_bias",
                                  nn.initializers.constant(0.01), (1,))
        linear_value = overall_bias + linear_value.sum(-1)

        fm_vectors = jnp.concatenate([user_exp, frame_concat], -1)
        tokens = fm_vectors.reshape(B, I, C, -1, d)
        att_input = d
        x = tokens
        for i in range(self.num_layers):
            attention = _FeatureSelfAttention(
                d_model=att_input, attention_d=self.attention_size,
                n_heads=self.num_heads, dtype=self.dtype,
                name=f"autoint_attention_{i}")(x)
            residual = dense(self.attention_size, f"residual_{i}",
                             dtype=self.dtype)(x)
            x = nn.relu(attention + residual)
            att_input = self.attention_size
        deep = MLPBlock(self.layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="deep_layers")(
            x.reshape(B, I, C, -1), deterministic=deterministic)
        clip_predictions = linear_value + deep[..., 0]
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        return self.integrate_clips(clip_predictions, feed, trainable)


class ClipFinalMLPModel(nn.Module, ClipScoreMixin):
    """ClipFinalMLPRec.py: two-stream MLPs per clip + 4D
    InteractionAggregation fusion."""
    feature_max: Dict[str, int]
    emb_size: int = 64
    mlp1_hidden_units: Sequence[int] = (64,)
    mlp2_hidden_units: Sequence[int] = (64,)
    use_fs: bool = True
    fs_hidden_units: Sequence[int] = (64,)
    num_heads: int = 1
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, self.emb_size, use_frames=self.use_frames,
            dtype=self.dtype, name="seg_embedder")(feed, feat_table)
        flat_emb = jnp.concatenate([user_exp, frame_concat], -1)
        if self.use_fs:
            # empty fs contexts -> learned-bias gates (FeatureSelection works
            # on (B, I, .) — flatten the clip axis into items for the gate)
            B, I, C, D = flat_emb.shape
            f1, f2 = FeatureSelection(
                feature_dim=D, embedding_dim=self.emb_size,
                fs_hidden_units=self.fs_hidden_units, feature_max=self.feature_max,
                dtype=self.dtype, name="fs_module")(
                feed, flat_emb.reshape(B, I * C, D),
                deterministic=deterministic)
            feat1, feat2 = f1.reshape(B, I, C, D), f2.reshape(B, I, C, D)
        else:
            feat1, feat2 = flat_emb, flat_emb
        m1 = MLPBlock(self.mlp1_hidden_units, dropout=self.dropout,
                      dtype=self.dtype, name="mlp1")(
            feat1, deterministic=deterministic)
        m2 = MLPBlock(self.mlp2_hidden_units, dropout=self.dropout,
                      dtype=self.dtype, name="mlp2")(
            feat2, deterministic=deterministic)
        clip_predictions = InteractionAggregation(
            x_dim=self.mlp1_hidden_units[-1],
            y_dim=self.mlp2_hidden_units[-1], output_dim=1,
            num_heads=self.num_heads, dtype=self.dtype,
            name="fusion_module")(m1, m2)
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        return self.integrate_clips(clip_predictions, feed, trainable)


class ClipAdaGINModel(nn.Module, ClipScoreMixin):
    """ClipAdaGINRec.py: AdaGIN graph interaction over the per-clip feature
    tokens [user, frame feats?, item||pos]."""
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
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        d = self.emb_size
        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, d, use_frames=self.use_frames,
            project_frame_id=True, dtype=self.dtype,
            name="seg_embedder")(feed, feat_table)
        tokens = jnp.stack(
            [user_exp] + [frame_concat[..., i * d:(i + 1) * d]
                          for i in range(frame_concat.shape[-1] // d)],
            axis=-2)  # (B, I, C, F, d)
        B, I, C, F, D = tokens.shape
        h_list = AutoGraphLayer(
            num_fields=F, embedding_dim=D, warm_dim=self.warm_dim,
            cold_dim=self.cold_dim, warm_tau=self.warm_tau,
            cold_tau=self.cold_tau,
            only_use_last_layer=self.only_use_last_layer,
            gnn_layers=self.num_gnn_layers, dtype=self.dtype,
            name="AutoGraph")(tokens.reshape(B * I * C, F, D))
        iu, ju = jnp.triu_indices(F)
        pre_ep = len(iu) * D
        mk = lambda units, name: MLPBlock(units, output_dim=1,
                                          dropout=self.dropout,
                                          dtype=self.dtype, name=name)
        mlps = [(mk(self.w_hidden_units, "W1"), mk(self.fi_hidden_units,
                                                   "mlp1")),
                (mk(self.w_hidden_units, "W2"), mk(self.fi_hidden_units,
                                                   "mlp2")),
                (mk(self.w_hidden_units, "W3"), mk(self.fi_hidden_units,
                                                   "mlp3"))]
        leaky = lambda x: jax.nn.leaky_relu(x, 0.01)
        fsw = self.param("final_score_weight",
                         nn.initializers.normal(1.0), (self.num_gnn_layers,))
        y = 0.0
        for li, h in enumerate(h_list):
            ep = h[:, iu, :] * h[:, ju, :]
            inputs = [ep.reshape(-1, pre_ep), ep.sum(-1),
                      h.reshape(h.shape[0], -1)]
            for (W, X), inp in zip(mlps, inputs):
                y = y + (leaky(W(inp, deterministic=deterministic))
                         * X(inp, deterministic=deterministic))[..., 0]
            if not self.only_use_last_layer:
                y = y * fsw[li]
        clip_predictions = y.reshape(B, I, C)
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        return self.integrate_clips(clip_predictions, feed, trainable)


class ClipDIENModel(nn.Module, ClipScoreMixin):
    """ClipDIENRec.py: DIEN interest evolution per (candidate, clip) segment
    + clip integration (same shape as ClipDINRec but with the DIEN trunk)."""
    feature_max: Dict[str, int]
    emb_size: int = 64
    evolving_gru_type: str = "AGRU"
    fcn_hidden_layers: Sequence[int] = (64,)
    dropout: float = 0.0
    adjust_interest_weight: bool = False
    duration_mask: bool = False
    norm_interest_type: str = "none"
    use_frames: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        from .dien import MaskedGRU
        d = self.emb_size
        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, d, use_frames=self.use_frames,
            project_frame_id=True, dtype=self.dtype,
            name="seg_embedder")(feed, feat_table)
        item_feats_emb = frame_concat if frame_concat.shape[-1] == d else \
            dense(d, "frame_reduce", dtype=self.dtype)(frame_concat)
        B, I, C, _ = item_feats_emb.shape
        history_emb = embed(self.feature_max["item_id"], d,
                            "hist_item_embedding", self.dtype)(
            feed["history_item_id"].astype(jnp.int32))
        L = history_emb.shape[1]

        gru = MaskedGRU(d, dtype=self.dtype, name="gru")
        attentionW = self.param("attentionW",
                                nn.initializers.normal(1.0), (d, d))
        cur = item_feats_emb.reshape(B * I * C, d)
        his = jnp.broadcast_to(history_emb[:, None, None],
                               (B, I, C, L, d)).reshape(B * I * C, L, d)
        lens = jnp.broadcast_to(feed["lengths"][:, None, None],
                                (B, I, C)).reshape(-1)
        rm = jnp.broadcast_to(feed["row_mask"][:, None, None],
                              (B, I, C)).reshape(-1)
        interest_emb, _ = gru(his, lens)
        prod = jnp.einsum("nlh,hk,nk->nl", interest_emb,
                          attentionW.astype(self.dtype), cur)
        prod = jnp.where(rm[:, None], prod, -jnp.inf)
        attention = jax.nn.softmax(prod.astype(jnp.float32),
                                   axis=0).astype(self.dtype)
        augru = MaskedGRU(d, cell_type="augru", dtype=self.dtype,
                          name="evolving_gru")
        _, h_out = augru(interest_emb, lens, attn=attention)
        user_flat = user_exp.reshape(B * I * C, d)
        history_sum = jnp.broadcast_to(
            history_emb.sum(1)[:, None, None], (B, I, C, d)
        ).reshape(B * I * C, d)
        inp = jnp.concatenate([user_flat, cur, history_sum,
                               cur * history_sum, h_out], -1)
        clip_predictions = MLPBlock(
            self.fcn_hidden_layers, output_dim=1, dropout=self.dropout,
            dtype=self.dtype, name="fcn_net")(
            inp, deterministic=deterministic)[..., 0].reshape(B, I, C)
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        if self.norm_interest_type != "none":
            # reuse the ClipDIN normalization path
            from .din import ClipDINModel  # noqa: F401  (documentation link)
        return self.integrate_clips(clip_predictions, feed, trainable)


class ClipCANModel(ClipDIENModel):
    """ClipCANRec.py: ClipDIEN trunk + user-item co-action features appended
    to the per-clip fcn input."""
    induce_vec_size: int = 512
    orders: int = 1
    co_action_layers: Sequence[int] = (4, 4)

    @nn.compact
    def __call__(self, feed, *, feat_table=None, deterministic: bool = True):
        from .can import co_action
        from .dien import MaskedGRU
        d = self.emb_size
        pre = d * self.orders
        need = 0
        for layer in self.co_action_layers:
            need += pre * layer + layer
            pre = layer
        induce_size = max(self.induce_vec_size, need)
        item_ids = feed["item_id"].astype(jnp.int32)
        B, I = item_ids.shape
        induction = embed(self.feature_max["item_id"], induce_size,
                          "item_embedding_induce", self.dtype)(item_ids)
        user_emb = embed(self.feature_max["user_id"], d, "can_user_emb",
                         self.dtype)(feed["user_id"].astype(jnp.int32))
        ui = co_action(induction,
                       jnp.concatenate([user_emb[:, None] ** (i + 1)
                                        for i in range(self.orders)], -1),
                       self.co_action_layers)          # (B, I, sum(layers))

        user_exp, frame_concat = ClipSegmentEmbedder(
            self.feature_max, d, use_frames=self.use_frames,
            project_frame_id=True, dtype=self.dtype,
            name="seg_embedder")(feed, feat_table)
        item_feats_emb = frame_concat if frame_concat.shape[-1] == d else \
            dense(d, "frame_reduce", dtype=self.dtype)(frame_concat)
        C = CLIP_NUM
        history_emb = embed(self.feature_max["item_id"], d,
                            "hist_item_embedding", self.dtype)(
            feed["history_item_id"].astype(jnp.int32))
        L = history_emb.shape[1]
        gru = MaskedGRU(d, dtype=self.dtype, name="gru")
        attentionW = self.param("attentionW",
                                nn.initializers.normal(1.0), (d, d))
        cur = item_feats_emb.reshape(B * I * C, d)
        his = jnp.broadcast_to(history_emb[:, None, None],
                               (B, I, C, L, d)).reshape(B * I * C, L, d)
        lens = jnp.broadcast_to(feed["lengths"][:, None, None],
                                (B, I, C)).reshape(-1)
        rm = jnp.broadcast_to(feed["row_mask"][:, None, None],
                              (B, I, C)).reshape(-1)
        interest_emb, _ = gru(his, lens)
        prod = jnp.einsum("nlh,hk,nk->nl", interest_emb,
                          attentionW.astype(self.dtype), cur)
        prod = jnp.where(rm[:, None], prod, -jnp.inf)
        attention = jax.nn.softmax(prod.astype(jnp.float32),
                                   axis=0).astype(self.dtype)
        augru = MaskedGRU(d, cell_type="augru", dtype=self.dtype,
                          name="evolving_gru")
        _, h_out = augru(interest_emb, lens, attn=attention)
        user_flat = user_exp.reshape(B * I * C, d)
        history_sum = jnp.broadcast_to(
            history_emb.sum(1)[:, None, None], (B, I, C, d)
        ).reshape(B * I * C, d)
        ui_exp = jnp.broadcast_to(ui[:, :, None, :],
                                  (B, I, C, ui.shape[-1])
                                  ).reshape(B * I * C, -1)
        inp = jnp.concatenate([ui_exp, user_flat, cur, history_sum,
                               cur * history_sum, h_out], -1)
        clip_predictions = MLPBlock(
            self.fcn_hidden_layers, output_dim=1, dropout=self.dropout,
            dtype=self.dtype, name="fcn_net")(
            inp, deterministic=deterministic)[..., 0].reshape(B, I, C)
        trainable = (self.param("trainable_interest_weight",
                                nn.initializers.ones, (CLIP_NUM,))
                     if self.adjust_interest_weight else None)
        return self.integrate_clips(clip_predictions, feed, trainable)
