"""MMRec trainer + leave-rank evaluator.

Behavioral spec: /root/reference/SkipPredBaseline/MMRec/src/common/trainer.py
(fit :48-…, eval-step early stopping with stopping_step=20,
best-test-upon-valid tracking :230-302) and utils/topk_evaluator.py
(interest_TopK_{mask,nonmask} :77-151, canonical logit export :152-178).

Training protocol: per-epoch uniform negative sampling of (user, pos, neg)
triplets over the train interactions; full-graph embeddings recomputed per
step; FREEDOM-style degree-sensitive edge dropout becomes a static-shape
per-epoch keep mask with renormalized values.

Evaluation: full-sort user scores -> per eval interaction, the candidate
frames of the watched video are gathered and the leave frame is ranked by
ASCENDING score with permutation tie-breaking (mask variant pads with +inf
and drops completed views).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .graph import masked_norm_values

logger = logging.getLogger(__name__)


@dataclass
class MMRecConfig:
    epochs: int = 1000
    stopping_step: int = 20
    learning_rate: float = 1e-3
    batch_size: int = 2048
    valid_metric: str = "hr@5"
    edge_dropout: float = 0.0      # FREEDOM degree-sensitive pruning rate
    seed: int = 2020
    use_mask_eval: bool = True


def interest_topk(interests, view_lengths, durations, mask: bool,
                  rng: Optional[np.random.Generator] = None):
    """interest_TopK_{mask,nonmask} (topk_evaluator.py:77-151): ascending
    rank of the leave position with random tie-breaking."""
    interests = np.asarray(interests, dtype=np.float64)
    bsz, seq_len = interests.shape
    vl = np.asarray(view_lengths).astype(np.int64).flatten()
    dur = np.asarray(durations).astype(np.int64).flatten()
    if mask:
        valid = vl != dur
        interests, vl, dur = interests[valid], vl[valid], dur[valid]
        m = np.arange(seq_len)[None, :] < dur[:, None]
        interests = np.where(m, interests, np.inf)
    else:
        valid = vl < seq_len
        interests, vl = interests[valid], vl[valid]
    bsz = len(vl)
    r = rng if rng is not None else np.random
    permuted = np.stack([r.permutation(seq_len) for _ in range(bsz)]) \
        if bsz else np.zeros((0, seq_len), np.int64)
    predictions = np.take_along_axis(interests, permuted, axis=1)
    sorted_idx = np.argsort(predictions, axis=1)
    target = np.argmax(permuted == vl[:, None], axis=1)
    gt_rank = np.argmax(sorted_idx == target[:, None], axis=1) + 1
    out = {}
    for k in (1, 3, 5, 10):
        hit = (gt_rank <= k).astype(np.float32)
        out[f"hr@{k}"] = float(hit.mean()) if bsz else float("nan")
        out[f"ndcg@{k}"] = float((hit / np.log2(gt_rank + 1)).mean()) \
            if bsz else float("nan")
    return out


class MMRecRunner:
    def __init__(self, model, cfg: MMRecConfig, train_users: np.ndarray,
                 train_items: np.ndarray, n_items: int, mesh=None):
        self.model = model
        self.cfg = cfg
        self.train_users = train_users.astype(np.int64)
        self.train_items = train_items.astype(np.int64)
        self.n_items = n_items
        self.rng = np.random.default_rng(cfg.seed)
        self.optimizer = optax.adam(cfg.learning_rate)
        self.model_name = type(model).__name__
        # LATTICE rebuilds its item-graph STRUCTURE from the learned
        # projections once per epoch / evaluation (lattice.py:137-157); the
        # fixed-shape edge array is a plain traced input, so one executable
        self.dynamic_graph = self.model_name == "LATTICE"
        self._knn_k = (len(model.mm_edges) // model.n_items
                       if self.dynamic_graph else 0)
        self.mesh = mesh
        if mesh is not None:
            # batch-parallel SPMD over the ('data','model') mesh, matching
            # segrec/runner.py: params/opt replicated, the triplet batch
            # (u/pos/neg/row_mask) split on the data axis, grad psum emitted
            # by XLA. The full-graph propagation (embeddings over the whole
            # edge set) is replicated compute by construction — the
            # reference trainer is single-GPU (trainer.py:48-302), so only
            # the per-batch loss term has a batch dimension to shard.
            from ..core.mesh import batch_sharding, replicated_sharding
            bs = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            self._jit_train = jax.jit(
                self._train_step, donate_argnums=(0,),
                in_shardings=(repl, bs, bs, bs, bs, repl, repl, repl),
                out_shardings=(repl, repl))
        else:
            self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_embed = jax.jit(
            lambda p, learned_edges=None: self.model.apply(
                {"params": p}, learned_edges=learned_edges,
                method="embeddings")
            if self.dynamic_graph else
            self.model.apply({"params": p}, method="embeddings"))
        if self.dynamic_graph:
            from .graph import knn_edges_device
            self._jit_knn = jax.jit(lambda p: knn_edges_device(
                self.model.apply({"params": p},
                                 method="projected_features"),
                self._knn_k))

    def _rebuild_edges(self, state):
        """Current learned kNN structure, or None for static-graph models."""
        if not self.dynamic_graph:
            return None
        return self._jit_knn(state["params"])

    def init_state(self):
        rng = jax.random.PRNGKey(self.cfg.seed)
        variables = self.model.init({"params": rng, "dropout": rng},
                                    method="init_all")
        params = variables["params"]
        return {"params": params, "opt_state": self.optimizer.init(params)}

    # ------------------------------------------------------------------
    def _loss(self, params, u_idx, pos_idx, neg_idx, row_mask, keep_values,
              rng, learned_edges=None):
        from .models import bpr_triplet_loss
        rngs = {"dropout": rng}
        if self.model_name == "BM3":
            return self.model.apply(
                {"params": params}, u_idx, pos_idx, row_mask, keep_values,
                method="bm3_loss", rngs=rngs)
        if self.dynamic_graph:
            u_all, i_all = self.model.apply(
                {"params": params}, keep_values, learned_edges,
                method="embeddings", rngs=rngs)
        else:
            u_all, i_all = self.model.apply({"params": params}, keep_values,
                                            method="embeddings", rngs=rngs)
        loss = bpr_triplet_loss(u_all[u_idx], i_all[pos_idx], i_all[neg_idx],
                                row_mask)
        loss = loss + self.model.apply(
            {"params": params}, u_all, i_all, u_idx, pos_idx, neg_idx,
            row_mask, method="extra_loss", rngs=rngs)
        if self.model_name == "SLMRec":
            loss = loss + self.model.apply(
                {"params": params}, pos_idx, row_mask, keep_values,
                method="ssl_loss", rngs=rngs)
        return loss

    def _train_step(self, state, u_idx, pos_idx, neg_idx, row_mask,
                    keep_values, rng, learned_edges=None):
        loss, grads = jax.value_and_grad(self._loss)(
            state["params"], u_idx, pos_idx, neg_idx, row_mask, keep_values,
            rng, learned_edges)
        updates, opt_state = self.optimizer.update(grads, state["opt_state"],
                                                   state["params"])
        return {"params": optax.apply_updates(state["params"], updates),
                "opt_state": opt_state}, loss

    def _epoch_keep_values(self):
        """FREEDOM degree-sensitive edge pruning as a static keep mask."""
        if self.cfg.edge_dropout <= 0:
            return None
        E = len(self.model.edge_values)
        p = np.asarray(self.model.edge_values, np.float64)
        p = p / p.sum()
        keep_n = int(E * (1 - self.cfg.edge_dropout))
        idx = self.rng.choice(E, size=keep_n, replace=False, p=p)
        keep = np.zeros(E, bool)
        keep[idx] = True
        return masked_norm_values(
            jnp.asarray(self.model.edge_u), jnp.asarray(self.model.edge_i),
            jnp.asarray(keep), self.model.n_users, self.model.n_items)

    def fit_epoch(self, state, rng_key):
        n = len(self.train_users)
        order = self.rng.permutation(n)
        neg = self.rng.integers(1, self.n_items, size=n)
        keep_values = self._epoch_keep_values()
        learned_edges = self._rebuild_edges(state)
        losses = []
        bs = self.cfg.batch_size
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            pad = bs - len(idx)
            row_mask = np.ones(bs, np.float32)
            if pad:
                row_mask[len(idx):] = 0.0
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            rng_key, k = jax.random.split(rng_key)
            state, loss = self._jit_train(
                state, jnp.asarray(self.train_users[idx]),
                jnp.asarray(self.train_items[idx]),
                jnp.asarray(neg[idx]), jnp.asarray(row_mask), keep_values, k,
                learned_edges)
            losses.append(float(loss))
        return state, float(np.mean(losses)), rng_key

    # ------------------------------------------------------------------
    def evaluate(self, state, eval_inters: List[dict],
                 frame_map: Dict[str, List[int]],
                 rng: Optional[np.random.Generator] = None):
        """eval_inters: [{userID, photo_id, view_length, duration}];
        scores come from the full-sort embeddings."""
        u_all, i_all = self._jit_embed(state["params"],
                                       self._rebuild_edges(state))
        u_all = np.asarray(u_all)
        i_all = np.asarray(i_all)
        interests = np.zeros((len(eval_inters), 40), np.float64)
        vls = np.zeros(len(eval_inters), np.int64)
        durs = np.zeros(len(eval_inters), np.int64)
        for r, inter in enumerate(eval_inters):
            frames = np.asarray(frame_map[str(inter["photo_id"])], np.int64)
            scores = u_all[int(inter["userID"])] @ i_all[frames].T
            interests[r, :len(frames)] = scores
            vls[r] = inter["view_length"]
            durs[r] = min(inter["duration"], 40)
        return interest_topk(interests, vls, durs, self.cfg.use_mask_eval,
                             rng)

    def export_logits(self, state, all_inters: List[dict],
                      frame_map: Dict[str, List[int]]) -> Dict[str, list]:
        """Canonical {user_id-photo_id-time: [40]} export, padding with the
        user's default-item score analogue (here: 0.0) —
        topk_evaluator.save_logits :152-178 mode '0'."""
        u_all, i_all = self._jit_embed(state["params"],
                                       self._rebuild_edges(state))
        u_all = np.asarray(u_all)
        i_all = np.asarray(i_all)
        out = {}
        for inter in all_inters:
            frames = np.asarray(frame_map[str(inter["photo_id"])], np.int64)
            scores = u_all[int(inter["userID"])] @ i_all[frames].T
            key = f"{inter['user_id']}-{inter['photo_id']}-{inter['time']}"
            out[key] = [float(x) for x in scores] \
                + [0.0] * (40 - len(frames))
        return out

    def train(self, dev_inters, test_inters, frame_map):
        """fit with eval-step early stopping + best-test-upon-valid
        (trainer.py:230-302)."""
        state = self.init_state()
        rng_key = jax.random.PRNGKey(self.cfg.seed)
        eval_rng = np.random.default_rng(self.cfg.seed)
        best_valid, best_valid_result, best_test_upon_valid = None, {}, {}
        best_state = jax.tree.map(np.asarray, state)
        stop_count = 0
        for epoch in range(self.cfg.epochs):
            state, loss, rng_key = self.fit_epoch(state, rng_key)
            if np.isnan(loss):
                logger.info("NaN loss at epoch %d, stop", epoch)
                break
            valid = self.evaluate(state, dev_inters, frame_map, eval_rng)
            metric = valid[self.cfg.valid_metric]
            test = self.evaluate(state, test_inters, frame_map, eval_rng)
            star = ""
            if best_valid is None or metric > best_valid:
                best_valid, best_valid_result = metric, valid
                best_test_upon_valid = test
                best_state = jax.tree.map(np.asarray, state)
                stop_count = 0
                star = " *"
            else:
                stop_count += 1
            logger.info("epoch %d loss=%.4f valid=%s%s", epoch, loss,
                        {k: round(v, 4) for k, v in valid.items()
                         if k in ("hr@5", "ndcg@5")}, star)
            if stop_count >= self.cfg.stopping_step:
                logger.info("early stop at epoch %d", epoch)
                break
        return best_state, {"best_valid_result": best_valid_result,
                            "best_test_upon_valid": best_test_upon_valid}
