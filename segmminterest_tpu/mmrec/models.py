"""MMRec model zoo: full-graph (user, item) embedding producers.

Behavioral spec: /root/reference/SkipPredBaseline/MMRec/src/models/{bpr,
lightgcn,layergcn,freedom,bm3,lattice,mmgcn,slmrec}.py. Every model exposes

    embeddings(keep_values=None) -> (user_emb (U, D), item_emb (I, D))

plus model-specific loss helpers the runner dispatches on. The reference's
positional hack is kept: a feature matrix whose last column is i_pos (x40)
adds a learned position embedding to the item ids (freedom.py:197-205).

All torch sparse matmuls are edge-list segment sums (graph.py); full-graph
propagation each step exactly as the reference does. Modules are
setup()-based so the runner can call ``embeddings`` and the loss methods
independently through ``apply(..., method=...)``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .graph import item_graph_propagate, propagate

XAVIER_U = nn.initializers.xavier_uniform()


def bpr_triplet_loss(u_e, pos_e, neg_e, row_mask):
    """-mean log sigmoid(pos - neg) (freedom.py bpr_loss)."""
    pos = (u_e * pos_e).sum(-1)
    neg = (u_e * neg_e).sum(-1)
    per = -jax.nn.log_sigmoid(pos - neg)
    n = jnp.maximum(row_mask.sum(), 1)
    return (per * row_mask).sum() / n


def _cos(a, b):
    na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    return (na * nb).sum(-1)


class _MMBase(nn.Module):
    """Shared fields + the LightGCN-style trunk every model reuses."""
    n_users: int
    n_items: int
    edge_u: Any
    edge_i: Any
    edge_values: Any
    emb_size: int = 64
    v_feat: Optional[Any] = None      # (I, Dv) or (I, Dv+1) with pos column
    mm_edges: Any = None
    mm_values: Any = None
    n_layers: int = 2
    n_mm_layers: int = 1
    feat_embed_dim: int = 64
    reg_weight: float = 1e-5
    lambda_coeff: float = 0.9
    dropout: float = 0.3
    ssl_alpha: float = 0.01
    ssl_temp: float = 0.5
    dtype: Any = jnp.float32

    @property
    def has_pos_column(self) -> bool:
        return self.v_feat is not None and self.v_feat.shape[-1] % 8 == 1

    def _setup_common(self, needs_modal_proj=False, proj_dim=None):
        self.user_embedding = self.param("user_embedding", XAVIER_U,
                                         (self.n_users, self.emb_size))
        self.item_id_embedding = self.param("item_id_embedding", XAVIER_U,
                                            (self.n_items, self.emb_size))
        if self.has_pos_column:
            self.new_pos_embedding = self.param("new_pos_embedding", XAVIER_U,
                                                (40, self.emb_size))
            self.learnable_param = self.param(
                "learnable_param", nn.initializers.constant(0.1), ())
        if needs_modal_proj and self.v_feat is not None:
            self.image_trs = nn.Dense(proj_dim or self.feat_embed_dim,
                                      kernel_init=XAVIER_U, name="image_trs")

    def _item_base(self):
        i = self.item_id_embedding
        if self.has_pos_column:
            pos = jnp.clip((jnp.asarray(self.v_feat[:, -1]) * 40)
                           .astype(jnp.int32), 0, 39)
            i = i + self.learnable_param * self.new_pos_embedding[pos]
        return i

    def _modal_features(self):
        if self.v_feat is None:
            return None
        f = jnp.asarray(self.v_feat)
        return f[:, :-1] if self.has_pos_column else f

    def _gcn(self, u, i, keep_values, n_layers):
        """mean-of-layers LightGCN propagation."""
        values = keep_values if keep_values is not None \
            else jnp.asarray(self.edge_values)
        eu, ei = jnp.asarray(self.edge_u), jnp.asarray(self.edge_i)
        ue, ie = u, i
        u_acc, i_acc = u, i
        for _ in range(n_layers):
            ue, ie = propagate(ue, ie, eu, ei, values)
            u_acc, i_acc = u_acc + ue, i_acc + ie
        return u_acc / (n_layers + 1), i_acc / (n_layers + 1)

    # default hooks the runner dispatches on
    def __call__(self, keep_values=None):
        return self.embeddings(keep_values)

    def extra_loss(self, u_all, i_all, u_idx, pos_idx, neg_idx, row_mask):
        return 0.0

    def init_all(self):
        """Trace every parameterized path once so init materializes all
        heads (flax creates params lazily on first call)."""
        u, i = self.embeddings(None)
        dummy = jnp.zeros((2,), jnp.int32)
        rm = jnp.ones((2,), jnp.float32)
        total = self.extra_loss(u, i, dummy, dummy, dummy, rm)
        if hasattr(self, "bm3_loss"):
            total = total + self.bm3_loss(dummy, dummy, rm)
        if hasattr(self, "ssl_loss"):
            total = total + self.ssl_loss(dummy, rm)
        return total


class BPRMM(_MMBase):
    """models/bpr.py: plain MF."""

    def setup(self):
        self._setup_common()

    def embeddings(self, keep_values=None):
        return self.user_embedding, self._item_base()


class LightGCNMM(_MMBase):
    """models/lightgcn.py."""

    def setup(self):
        self._setup_common()

    def embeddings(self, keep_values=None):
        return self._gcn(self.user_embedding, self._item_base(),
                         keep_values, self.n_layers)


class LayerGCNMM(_MMBase):
    """models/layergcn.py: layer outputs reweighted by cosine similarity with
    the ego embedding, SUMMED."""

    def setup(self):
        self._setup_common()

    def embeddings(self, keep_values=None):
        u, i = self.user_embedding, self._item_base()
        values = keep_values if keep_values is not None \
            else jnp.asarray(self.edge_values)
        eu, ei = jnp.asarray(self.edge_u), jnp.asarray(self.edge_i)
        ue, ie = u, i
        u_sum = jnp.zeros_like(u)
        i_sum = jnp.zeros_like(i)
        for _ in range(self.n_layers):
            ue, ie = propagate(ue, ie, eu, ei, values)
            ue = _cos(ue, u)[:, None] * ue
            ie = _cos(ie, i)[:, None] * ie
            u_sum, i_sum = u_sum + ue, i_sum + ie
        return u_sum, i_sum


class FREEDOM(_MMBase):
    """models/freedom.py: frozen item kNN mm-graph on top of the user-item
    GCN; modality-alignment BPR term weighted by reg_weight."""
    n_ui_layers: int = 2

    def setup(self):
        # the modality-alignment BPR term dots user embeddings against the
        # projected features, so the projection must match emb_size (the
        # reference configs set feat_embed_dim == embedding_size)
        self._setup_common(needs_modal_proj=True, proj_dim=self.emb_size)

    def embeddings(self, keep_values=None):
        i = self._item_base()
        h = i
        for _ in range(self.n_mm_layers):
            h = item_graph_propagate(h, jnp.asarray(self.mm_edges),
                                     jnp.asarray(self.mm_values))
        u_g, i_g = self._gcn(self.user_embedding, i, keep_values,
                             self.n_ui_layers)
        return u_g, i_g + h

    def extra_loss(self, u_all, i_all, u_idx, pos_idx, neg_idx, row_mask):
        feats = self._modal_features()
        if feats is None:
            return 0.0
        proj = self.image_trs(feats)
        return self.reg_weight * bpr_triplet_loss(
            u_all[u_idx], proj[pos_idx], proj[neg_idx], row_mask)


class LATTICE(_MMBase):
    """models/lattice.py: item_adj = lambda * original_adj (frozen global
    sim-weighted kNN of raw features, lattice.py:72-76) + (1-lambda) *
    learned_adj (kNN REBUILT each epoch from the projected learned features,
    :137-157).

    TPU redesign: the rebuilt STRUCTURE arrives as a fixed-shape (n*k, 2)
    edge array input (runner recomputes it on device once per epoch /
    evaluation via graph.knn_edges_device), and the sim-weighted laplacian
    VALUES are computed in-graph from the projections — differentiable on
    every batch, where the reference detaches after the epoch's first batch
    (:158-159, a deviation that only widens the gradient signal). With
    ``learned_edges=None`` the learned weights fall back onto the frozen
    structure (no-rebuild mode)."""
    n_ui_layers: int = 2

    def setup(self):
        self._setup_common(needs_modal_proj=True)

    def projected_features(self):
        """image_trs(features) — the runner pulls this to rebuild the kNN
        structure (lattice.py:134)."""
        feats = self._modal_features()
        return self.image_trs(feats) if feats is not None else None

    def embeddings(self, keep_values=None, learned_edges=None):
        from .graph import weighted_laplacian_values

        i = self._item_base()
        mm_edges = jnp.asarray(self.mm_edges)
        mm_values = jnp.asarray(self.mm_values)
        feats = self._modal_features()
        lam = self.lambda_coeff
        if feats is not None:
            proj = self.image_trs(feats)
            edges_l = (jnp.asarray(learned_edges)
                       if learned_edges is not None else mm_edges)
            values_l = weighted_laplacian_values(edges_l, proj, self.n_items)
        else:
            edges_l, values_l = mm_edges, mm_values
            lam = 1.0
        h = i
        for _ in range(self.n_mm_layers):
            h = lam * item_graph_propagate(h, mm_edges, mm_values) \
                + (1 - lam) * item_graph_propagate(h, edges_l, values_l)
        u_g, i_g = self._gcn(self.user_embedding, i, keep_values,
                             self.n_ui_layers)
        return u_g, i_g + h


class BM3(_MMBase):
    """models/bm3.py: bootstrap latent targets — LightGCN trunk + predictor;
    cosine mismatch between online projections and dropped-out stop-gradient
    targets, plus modal terms (calculate_loss :55-120)."""

    def setup(self):
        self._setup_common(needs_modal_proj=True, proj_dim=self.emb_size)
        self.predictor = nn.Dense(self.emb_size, kernel_init=XAVIER_U,
                                  name="predictor")

    def embeddings(self, keep_values=None):
        return self._gcn(self.user_embedding, self._item_base(),
                         keep_values, self.n_layers)

    def bm3_loss(self, u_idx, pos_idx, row_mask, keep_values=None):
        u_all, i_all = self.embeddings(keep_values)
        rng = self.make_rng("dropout")
        k1, k2, k3 = jax.random.split(rng, 3)
        drop = lambda key, x: x * (jax.random.bernoulli(
            key, 1 - self.dropout, x.shape) / (1 - self.dropout))
        u_t = drop(k1, jax.lax.stop_gradient(u_all))[u_idx]
        i_t = drop(k2, jax.lax.stop_gradient(i_all))[pos_idx]
        u_on = self.predictor(u_all)[u_idx]
        i_on = self.predictor(i_all)[pos_idx]
        n = jnp.maximum(row_mask.sum(), 1)
        total = ((1 - _cos(u_on, i_t)) * row_mask).sum() / n \
            + ((1 - _cos(i_on, u_t)) * row_mask).sum() / n
        feats = self._modal_features()
        if feats is not None:
            trs = self.image_trs(feats)
            f_t = drop(k3, jax.lax.stop_gradient(trs))[pos_idx]
            f_on = self.predictor(trs)[pos_idx]
            loss_v = ((1 - _cos(f_on, jax.lax.stop_gradient(i_t)))
                      * row_mask).sum() / n
            loss_vv = ((1 - _cos(f_on, f_t)) * row_mask).sum() / n
            total = total + self.reg_weight * (loss_v + loss_vv)
        return total


class MMGCN(_MMBase):
    """models/mmgcn.py (single-modality configuration): a per-modality GCN
    whose item nodes start from projected modal features, combined with the
    id embeddings."""

    def setup(self):
        self._setup_common()
        if self.v_feat is not None:
            self.modal_trs = nn.Dense(self.emb_size, kernel_init=XAVIER_U,
                                      name="modal_trs")
            self.modal_layers_u = [
                nn.Dense(self.emb_size, kernel_init=XAVIER_U,
                         name=f"modal_layer_u_{l}")
                for l in range(self.n_layers)]
            self.modal_layers_i = [
                nn.Dense(self.emb_size, kernel_init=XAVIER_U,
                         name=f"modal_layer_i_{l}")
                for l in range(self.n_layers)]

    def embeddings(self, keep_values=None):
        u, i = self.user_embedding, self._item_base()
        feats = self._modal_features()
        if feats is None:
            return u, i
        values = keep_values if keep_values is not None \
            else jnp.asarray(self.edge_values)
        eu, ei = jnp.asarray(self.edge_u), jnp.asarray(self.edge_i)
        fi = self.modal_trs(feats)
        fu = jnp.zeros((self.n_users, self.emb_size), fi.dtype)
        for l in range(self.n_layers):
            fu, fi = propagate(fu, fi, eu, ei, values)
            fi = jax.nn.leaky_relu(self.modal_layers_i[l](fi))
            fu = jax.nn.leaky_relu(self.modal_layers_u[l](fu))
        return u + fu, i + fi


class SLMRec(_MMBase):
    """models/slmrec.py (compact): LightGCN trunk with modal-feature item
    initialization + a feature-dropout InfoNCE self-supervision term."""

    def setup(self):
        self._setup_common()
        if self.v_feat is not None:
            self.modal_trs = nn.Dense(self.emb_size, kernel_init=XAVIER_U,
                                      name="modal_trs")

    def embeddings(self, keep_values=None):
        i = self._item_base()
        feats = self._modal_features()
        if feats is not None:
            i = i + self.modal_trs(feats)
        return self._gcn(self.user_embedding, i, keep_values, self.n_layers)

    def ssl_loss(self, pos_idx, row_mask, keep_values=None):
        _, i_all = self.embeddings(keep_values)
        rng = self.make_rng("dropout")
        k1, k2 = jax.random.split(rng)
        e = i_all[pos_idx]
        drop = lambda key, x: x * (jax.random.bernoulli(
            key, 1 - 0.1, x.shape) / 0.9)
        v1 = drop(k1, e)
        v2 = drop(k2, e)
        v1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + 1e-12)
        v2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12)
        logits = (v1 @ v2.T) / self.ssl_temp
        labels = jnp.arange(e.shape[0])
        per = -jax.nn.log_softmax(logits, -1)[labels, labels]
        n = jnp.maximum(row_mask.sum(), 1)
        return self.ssl_alpha * (per * row_mask).sum() / n


MMREC_REGISTRY = {
    "BPR": BPRMM,
    "LightGCN": LightGCNMM,
    "LayerGCN": LayerGCNMM,
    "FREEDOM": FREEDOM,
    "BM3": BM3,
    "LATTICE": LATTICE,
    "MMGCN": MMGCN,
    "SLMRec": SLMRec,
}
