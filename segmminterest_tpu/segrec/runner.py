"""SegRec runners: jitted train/eval loops for ranking and CTR tasks.

Behavioral spec: /root/reference/SegRec/helpers/BaseRunner.py (:18-271) and
CTRRunner.py (:20-79):
 * per-epoch negative sampling, then candidate shuffle before the forward and
   un-shuffle of predictions (anti-position-leak, :192-208) — ONLY item_id is
   shuffled, exactly like the reference;
 * ranking loss = softmax-weighted soft BPR (BaseModel.py:212-226); CTR loss
   = BCE on sigmoid outputs; optional BCE ranking loss
   (BaseContextModel.py:63-73);
 * dev-metric early stop: non-increasing window or best-age > patience
   (:220-225);
 * evaluate_method: rank of the first column among candidates with the
   all-equal random fallback (:53-80); CTR: AUC/F1/ACC/LogLoss (:22-43) and
   WUAUC (main.py:101-117);
 * optimizer by name, weight decay excluded for bias params
   (BaseModel.customize_parameters :77-86, torch-Adam-style L2).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.mesh import batch_sharding, replicated_sharding
from ..engine.evaluation import _auc_score
from .feeds import FeedBuilder

logger = logging.getLogger(__name__)

DEVICE_KEYS_EXCLUDE = ("time",)


@dataclass
class RunnerConfig:
    epoch: int = 200
    early_stop: int = 10
    lr: float = 1e-3
    l2: float = 0.0
    batch_size: int = 512
    eval_batch_size: int = 512
    optimizer: str = "Adam"
    topk: Tuple[int, ...] = (5, 10, 20, 50)
    metrics: Tuple[str, ...] = ("NDCG", "HR")
    main_metric: str = ""
    loss_n: str = "BPR"          # BPR | BCE | DirectAU (ranking); BCE | MSE (ctr)
    directau_gamma: float = 1.0
    ctc_temp: float = 1.0        # ContraRec context-target temperature
    auxillary_loss_weight: float = 0.0
    margin: float = 0.0          # CFKG / Chorus-KG hinge margin
    seed: int = 0
    test_epoch: int = -1


def _device_feed(feed: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k: v for k, v in feed.items() if k not in DEVICE_KEYS_EXCLUDE}


def bpr_loss(predictions, row_mask):
    """Softmax-weighted soft BPR (BaseModel.py:212-226)."""
    pos, neg = predictions[:, 0], predictions[:, 1:]
    neg_softmax = jax.nn.softmax(neg, axis=1)
    s = (jax.nn.sigmoid(pos[:, None] - neg) * neg_softmax).sum(axis=1)
    per_row = -jnp.log(jnp.clip(s, 1e-8, 1 - 1e-8))
    n = jnp.maximum(row_mask.sum(), 1)
    return jnp.where(row_mask, per_row, 0.0).sum() / n


def bce_ranking_loss(predictions, row_mask):
    """BCE over sigmoid candidate scores (BaseContextModel.py:66-70)."""
    p = jax.nn.sigmoid(predictions)
    pos, neg = p[:, 0], p[:, 1:]
    per_row = -(jnp.log(jnp.clip(pos, 1e-12, 1.0))
                + jnp.log(jnp.clip(1 - neg, 1e-12, 1.0)).sum(axis=1))
    n = jnp.maximum(row_mask.sum(), 1)
    return jnp.where(row_mask, per_row, 0.0).sum() / n


def bce_ctr_loss(probs, labels, row_mask):
    """nn.BCELoss over probabilities (BaseModel.py:345-358)."""
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    ce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    n = jnp.maximum(row_mask.sum(), 1)
    return jnp.where(row_mask, ce, 0.0).sum() / n


def evaluate_ranking(predictions: np.ndarray, topk, metrics,
                     rng: Optional[np.random.Generator] = None):
    """HR/NDCG of the first-column ground truth (BaseRunner.py:53-80)."""
    gt_rank = (predictions > predictions[:, 0].reshape(-1, 1)).sum(-1) + 1
    if (gt_rank != 1).sum() == 0:
        r = rng if rng is not None else np.random
        pred_rnd = predictions.copy()
        pred_rnd[:, 1:] += r.random(
            (predictions.shape[0], predictions.shape[1] - 1)) * 1e-6
        gt_rank = (pred_rnd > predictions[:, 0].reshape(-1, 1)).sum(-1) + 1
    evaluations = {}
    for k in topk:
        hit = gt_rank <= k
        for metric in metrics:
            key = f"{metric}@{k}"
            if metric == "HR":
                evaluations[key] = float(hit.mean())
            elif metric == "NDCG":
                evaluations[key] = float((hit / np.log2(gt_rank + 1)).mean())
            else:
                raise ValueError(f"Undefined metric {metric}")
    return evaluations


def evaluate_leave_ranking(predictions: np.ndarray, topk, metrics,
                           durations=None, data_name: str = "",
                           rng: Optional[np.random.Generator] = None):
    """Leave-frame ranking (SkipPredBaseline/ReChorus/src/helpers/
    BaseRunner.py:52-114): rank of candidate 0 (the leave frame) by
    ASCENDING score with random-permutation tie-breaking. Duration-mask
    variants push out-of-duration candidates to +inf; 'Default' datasets trim
    the trailing default-item row."""
    predictions = np.asarray(predictions, dtype=np.float64)
    bsz, seq_len = predictions.shape
    if (durations is not None and "Default" not in data_name
            and "Fill" not in data_name):
        dur = np.asarray(durations)[:, None]
        mask = np.arange(seq_len)[None, :] < dur
        predictions = np.where(mask, predictions, np.inf)
    elif "Default" in data_name:
        predictions = predictions[:-1]
        bsz -= 1
    elif "Fill" in data_name:
        # Fill datasets append a fixed count of filler rows that the
        # evaluator trims (BaseRunner.py:82-87): 23 for KuaiMM, 36 for
        # KuaiRand — the reference's dataset-specific magic constants
        n_fill = 36 if "KuaiRand" in data_name else 23
        predictions = predictions[:-n_fill]
        bsz -= n_fill
    r = rng if rng is not None else np.random
    permuted = np.stack([r.permutation(seq_len) for _ in range(bsz)]) \
        if bsz else np.zeros((0, seq_len), np.int64)
    shuffled = np.take_along_axis(predictions, permuted, axis=1)
    sorted_indices = np.argsort(shuffled, axis=1)
    target = np.argmax(permuted == 0, axis=1)
    gt_rank = np.argmax(sorted_indices == target[:, None], axis=1) + 1
    evaluations = {}
    for k in topk:
        hit = gt_rank <= k
        for metric in metrics:
            key = f"{metric}@{k}"
            if metric == "HR":
                evaluations[key] = float(hit.mean()) if bsz else float("nan")
            elif metric == "NDCG":
                evaluations[key] = float(
                    (hit / np.log2(gt_rank + 1)).mean()) if bsz else float("nan")
            else:
                raise ValueError(f"Undefined metric {metric}")
    return evaluations


def evaluate_ctr(predictions: np.ndarray, labels: np.ndarray, metrics):
    """AUC/F1/ACC/LogLoss (CTRRunner.py:22-43)."""
    evaluations = {}
    for metric in metrics:
        if metric == "ACC":
            evaluations[metric] = float(
                ((predictions > 0.5).astype(int) == labels.astype(int)).mean())
        elif metric == "AUC":
            evaluations[metric] = _auc_score(labels, predictions)
        elif metric == "F1_SCORE":
            pred_bin = (predictions > 0.5).astype(int)
            tp = ((pred_bin == 1) & (labels == 1)).sum()
            fp = ((pred_bin == 1) & (labels == 0)).sum()
            fn = ((pred_bin == 0) & (labels == 1)).sum()
            prec = tp / max(tp + fp, 1)
            rec = tp / max(tp + fn, 1)
            evaluations[metric] = float(
                2 * prec * rec / max(prec + rec, 1e-12))
        elif metric == "LOG_LOSS":
            p = np.clip(predictions, 1e-7, 1 - 1e-7)
            evaluations[metric] = float(
                -(np.log(p) * labels + np.log(1 - p) * (1 - labels)).mean())
        else:
            raise ValueError(f"Undefined metric {metric}")
    return evaluations


def evaluate_wuauc(predictions, labels, user_ids):
    """Per-user ROC-AUC weighted by interaction count (main.py:101-117)."""
    total, length = 0.0, 0
    for u in np.unique(user_ids):
        sel = user_ids == u
        try:
            auc = _auc_score(labels[sel], predictions[sel])
        except ValueError:
            continue
        total += auc * sel.sum()
        length += sel.sum()
    return total / max(length, 1)


class RankingRunner:
    task = "ranking"

    def __init__(self, model, cfg: RunnerConfig, feat_table=None, mesh=None):
        self.model = model
        self.cfg = cfg
        self.metrics = tuple(m.strip().upper() for m in cfg.metrics)
        self.topk = tuple(cfg.topk)
        self.main_metric = cfg.main_metric or \
            f"{self.metrics[0]}@{self.topk[0]}"
        self.feat_table = (jnp.asarray(feat_table)
                           if feat_table is not None else None)
        self.optimizer = self._build_optimizer()
        self.rng = np.random.default_rng(cfg.seed)
        self.mesh = mesh
        if mesh is not None:
            # batch-parallel SPMD over the ('data','model') mesh: params and
            # optimizer state replicated, batches split on the leading axis,
            # gradient psum emitted by XLA — the TPU-native stand-in for the
            # reference's never-called DDP utilities
            # (kn_util/distributed/utils.py:47-63)
            bs = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            self._jit_train = jax.jit(
                self._train_step, donate_argnums=(0,),
                in_shardings=(repl, bs, repl), out_shardings=(repl, repl))
            self._jit_eval = jax.jit(
                self._eval_step, in_shardings=(repl, bs, repl),
                out_shardings=bs)
        else:
            self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
            self._jit_eval = jax.jit(self._eval_step)
        self._momentum_update = None
        if hasattr(type(model), "momentum_update"):
            # BUIR-style target-network EMA applied after every step
            self._momentum_update = jax.jit(
                lambda p: type(model).momentum_update(p, model.momentum))
        self.state = None

    # ------------------------------------------------------------------
    def _build_optimizer(self):
        cfg = self.cfg
        no_decay_mask = lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: not str(path[-1]).strip(".[]'").endswith("bias"),
            params)
        opts = {
            "adam": optax.adam, "adagrad": optax.adagrad,
            "sgd": optax.sgd, "adadelta": lambda lr: optax.adadelta(lr),
        }
        base = opts[cfg.optimizer.lower()](cfg.lr)
        if cfg.l2 > 0:
            # torch Adam(weight_decay) = L2 folded into the gradient before
            # the update; biases excluded (customize_parameters)
            return optax.chain(
                optax.add_decayed_weights(cfg.l2, mask=no_decay_mask), base)
        return base

    def _loss(self, predictions, batch, params=None):
        if "unshuffle" in batch:
            # restore candidate order so column 0 is the target
            # (BaseRunner.py:199-208)
            predictions = jnp.take_along_axis(predictions,
                                              batch["unshuffle"], axis=1)
        if self.cfg.loss_n in ("CFKG", "ChorusKG"):
            # margin ranking over the (pos,pos,neg-tail,neg-head) quadruple
            # layout (CFKG.py:70-76 / Chorus.py:168-177)
            from .kg import cfkg_margin_loss
            return cfkg_margin_loss(predictions,
                                    batch["row_mask"], self.cfg.margin)
        if self.cfg.loss_n == "S3Rec":
            # pretrain: the sown mip+sp losses ARE the objective
            return jnp.asarray(0.0, jnp.float32)
        if self.cfg.loss_n == "CLRec":
            # the in-batch InfoNCE sown by the model IS the objective
            # (CLRec.py:61-63); nothing prediction-based is added
            return jnp.asarray(0.0, jnp.float32)
        if self.cfg.loss_n == "ContraRec":
            # context-target contrastive: temperature softmax over the
            # candidate axis, NLL of column 0 (ContraRec.py:101-105); the
            # context-context term arrives via the sown 'losses' collection
            p = jax.nn.softmax(predictions / self.cfg.ctc_temp, axis=1)
            per_row = -self.cfg.ctc_temp * jnp.log(
                jnp.clip(p[:, 0], 1e-12, 1.0))
            rm = batch["row_mask"].astype(jnp.float32)
            return (per_row * rm).sum() / jnp.maximum(rm.sum(), 1)
        if self.cfg.loss_n == "BUIR" and params is not None:
            # bootstrap loss over online/target tables (general/BUIR.py:101-114)
            from .models.general import BUIRModel
            return BUIRModel.buir_loss(
                params, batch["user_id"].astype(jnp.int32),
                batch["item_id"][:, 0].astype(jnp.int32),
                batch["row_mask"].astype(jnp.float32))
        if self.cfg.loss_n == "DirectAU" and params is not None:
            # alignment/uniformity over the MF embeddings
            # (general/DirectAU.py)
            from .models.general import DirectAUModel
            u_tab = params["u_embeddings"]["embedding"]
            i_tab = params["i_embeddings"]["embedding"]
            u_e = u_tab[batch["user_id"].astype(jnp.int32)]
            i_e = i_tab[batch["item_id"][:, 0].astype(jnp.int32)]
            return DirectAUModel.direct_au_loss(
                u_e, i_e, batch["row_mask"].astype(jnp.float32),
                self.cfg.directau_gamma)
        if self.cfg.loss_n == "BCE":
            return bce_ranking_loss(predictions, batch["row_mask"])
        return bpr_loss(predictions, batch["row_mask"])

    def _apply(self, variables, batch, deterministic, rngs=None,
               mutable=False):
        kwargs = dict(deterministic=deterministic)
        if self.feat_table is not None:
            kwargs["feat_table"] = self.feat_table
        return self.model.apply(variables, batch, rngs=rngs,
                                mutable=mutable, **kwargs)

    def _train_step(self, state, batch, rng):
        has_bn = "batch_stats" in state

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state["batch_stats"]
            rngs = {"dropout": rng, "gumbel": jax.random.fold_in(rng, 7)}
            mutable = ["losses"] + (["batch_stats"] if has_bn else [])
            out, mutated = self._apply(variables, batch, False, rngs,
                                       mutable=mutable)
            loss = self._loss(out, batch, params)
            sown = mutated.get("losses", {})
            if sown:
                # contrastive is weighted by the runner
                # (BaseRunner.py:210-214); other sown terms (e.g. DCNv2's
                # reg_loss) arrive pre-weighted by the model
                for path, v in jax.tree_util.tree_flatten_with_path(sown)[0]:
                    w = (self.cfg.auxillary_loss_weight
                         if "contrastive" in jax.tree_util.keystr(path)
                         else 1.0)
                    loss = loss + w * v
            if hasattr(self.model, "reg_loss"):
                # AFM/xDeepFM-style L2 terms over specific parameter groups
                # (AFM.py:103-106, xDeepFM.py:77-94)
                loss = loss + self.model.reg_loss(params)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state}
        if has_bn:
            new_state["batch_stats"] = mutated["batch_stats"]
        return new_state, loss

    def _eval_step(self, state, batch, rng):
        variables = {"params": state["params"]}
        if "batch_stats" in state:
            variables["batch_stats"] = state["batch_stats"]
        return self._apply(variables, batch, True, {"gumbel": rng})

    # ------------------------------------------------------------------
    def init_state(self, example_feed):
        rng = jax.random.PRNGKey(self.cfg.seed)
        kwargs = {}
        if self.feat_table is not None:
            kwargs["feat_table"] = self.feat_table
        variables = self.model.init(
            {"params": rng, "dropout": rng, "gumbel": rng},
            _device_feed(example_feed), deterministic=True, **kwargs)
        state = {"params": variables["params"],
                 "opt_state": self.optimizer.init(variables["params"])}
        if "batch_stats" in variables:
            state["batch_stats"] = variables["batch_stats"]
        return state

    def _shuffled_batch(self, feed):
        """Candidate shuffle of item_id only (BaseRunner.py:192-208)."""
        items = feed["item_id"]
        B, I = items.shape
        perm = np.argsort(self.rng.random((B, I)), axis=-1)
        shuffled = dict(feed)
        shuffled["item_id"] = np.take_along_axis(items, perm, axis=1)
        shuffled["unshuffle"] = np.argsort(perm, axis=-1)
        return shuffled, perm

    def fit(self, builder: FeedBuilder, state, epoch: int):
        builder.actions_before_epoch()
        losses = []
        for feed in builder.batches(self.cfg.batch_size, shuffle=True):
            if self.task == "ranking" and "item_id" in feed:
                feed_s, perm = self._shuffled_batch(feed)
            else:
                feed_s, perm = feed, None
            rng = jax.random.PRNGKey(
                int(self.rng.integers(0, 2 ** 31 - 1)))
            state, loss = self._jit_train(state, _device_feed(feed_s), rng)
            if self._momentum_update is not None:
                # BUIR target-network EMA after every step (BUIRRunner)
                state = dict(state)
                state["params"] = self._momentum_update(state["params"])
            losses.append(float(loss))
        return state, float(np.mean(losses)) if losses else float("nan")

    def predict(self, builder: FeedBuilder, state) -> np.ndarray:
        preds = []
        rng = jax.random.PRNGKey(self.cfg.seed)
        for feed in builder.batches(self.cfg.eval_batch_size, shuffle=False):
            out = np.asarray(self._jit_eval(state, _device_feed(feed), rng))
            preds.append(out[feed["row_mask"]])
        predictions = np.concatenate(preds, axis=0)
        if getattr(builder, "test_all", False):
            # column j >= 1 scores item id j; already-clicked items are
            # pushed out of the ranking (BaseRunner.py:254-261)
            corpus = builder.corpus
            for i, u in enumerate(builder.user_id):
                clicked = (corpus.train_clicked_set.get(u, set())
                           | corpus.residual_clicked_set.get(u, set()))
                predictions[i, list(clicked)] = -np.inf
        return predictions

    def evaluate(self, builder: FeedBuilder, state, topk=None, metrics=None):
        predictions = self.predict(builder, state)
        return evaluate_ranking(predictions, topk or self.topk,
                                metrics or self.metrics, rng=self.rng)

    @staticmethod
    def eval_termination(criterion: List[float], patience: int) -> bool:
        if patience <= 0:
            return False
        if len(criterion) > patience:
            window = criterion[-patience:]
            if all(window[i] >= window[i + 1]
                   for i in range(len(window) - 1)):
                return True
        return len(criterion) - criterion.index(max(criterion)) > patience

    def save_state(self, state, path: str):
        """Serialize params (msgpack) — ReChorus BaseModel.save_model."""
        import os
        from flax import serialization
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(
                jax.tree.map(np.asarray, state["params"])))
        logger.info("Save model to %s", path)

    def load_state(self, state, path: str, partial: bool = False):
        """Restore params; with ``partial`` only keys present in BOTH trees
        are taken (ReChorus TiMiRec.load_model:92-101 — the finetune stage
        absorbs the pretrained extractor subset)."""
        from flax import serialization
        with open(path, "rb") as f:
            loaded = serialization.from_bytes(
                jax.tree.map(np.asarray, state["params"]), f.read())                 if not partial else serialization.msgpack_restore(f.read())
        params = state["params"]
        if partial:
            def merge(cur, new):
                out = {}
                for k, v in cur.items():
                    if k in new and isinstance(v, dict):
                        out[k] = merge(v, new[k])
                    elif k in new and getattr(new[k], "shape", None) ==                             getattr(v, "shape", None):
                        out[k] = jnp.asarray(new[k], v.dtype)
                    else:
                        out[k] = v
                return out
            params = merge(params, loaded)
        else:
            params = loaded
        state = dict(state)
        state["params"] = jax.tree.map(jnp.asarray, params)
        state["opt_state"] = self.optimizer.init(state["params"])
        logger.info("Load model from %s%s", path,
                    " (partial)" if partial else "")
        return state

    def train(self, builders: Dict[str, FeedBuilder],
              init_path: str = "", do_train: bool = True):
        """Full training loop (BaseRunner.py:120-180). Returns
        (best_state, history dict)."""
        example = next(builders["dev"].batches(self.cfg.eval_batch_size,
                                               shuffle=False))
        if builders["train"].task == "ranking":
            builders["train"].actions_before_epoch()
            example = next(builders["train"].batches(
                self.cfg.batch_size, shuffle=False))
        state = self.init_state(example)
        if self._momentum_update is not None and \
                hasattr(type(self.model), "sync_targets"):
            state = dict(state)
            state["params"] = type(self.model).sync_targets(state["params"])
        if init_path:
            import os
            if os.path.exists(init_path):
                state = self.load_state(state, init_path, partial=True)
            else:
                logger.info("Train from scratch! (%s missing)", init_path)
        if not do_train:
            return jax.tree.map(np.asarray, state), {"main_results": [],
                                                     "dev_results": []}
        main_results: List[float] = []
        dev_results: List[Dict[str, float]] = []
        best_state = jax.tree.map(np.asarray, state)
        try:
            for epoch in range(self.cfg.epoch):
                state, loss = self.fit(builders["train"], state, epoch + 1)
                if np.isnan(loss):
                    logger.info("Loss is NaN. Stop training at %d.",
                                epoch + 1)
                    break
                dev_result = self.evaluate(
                    builders["dev"], state,
                    topk=[int(self.main_metric.split("@")[1])]
                    if "@" in self.main_metric else None)
                dev_results.append(dev_result)
                main_results.append(dev_result[self.main_metric])
                star = ""
                if max(main_results) == main_results[-1]:
                    best_state = jax.tree.map(np.asarray, state)
                    star = " *"
                logger.info("Epoch %-4d loss=%.4f dev=%s%s", epoch + 1, loss,
                            dev_result, star)
                if self.eval_termination(main_results, self.cfg.early_stop):
                    logger.info("Early stop at %d based on dev result.",
                                epoch + 1)
                    break
        except KeyboardInterrupt:
            # graceful exit keeping the best state so far
            # (BaseRunner.py:165-170)
            logger.info("Interrupted; returning best state so far "
                        "(%d completed evals).", len(dev_results))
        best_epoch = int(np.argmax(main_results)) if main_results else -1
        logger.info("Best Iter(dev)=%d dev=%s", best_epoch + 1,
                    dev_results[best_epoch] if dev_results else {})
        return best_state, {"main_results": main_results,
                            "dev_results": dev_results}


class LeaveRankingRunner(RankingRunner):
    """Ranking runner whose evaluation is the leave-frame variant of the
    SkipPredBaseline ReChorus fork (ascending-score rank of the leave frame
    with duration masking / default-row trimming)."""

    def __init__(self, model, cfg: RunnerConfig, feat_table=None,
                 data_name: str = "", mesh=None):
        super().__init__(model, cfg, feat_table, mesh=mesh)
        self.data_name = data_name

    def evaluate(self, builder: FeedBuilder, state, topk=None, metrics=None):
        predictions = self.predict(builder, state)
        durations = builder.situations.get("c_frame_length")
        return evaluate_leave_ranking(
            predictions, topk or self.topk, metrics or self.metrics,
            durations=durations, data_name=self.data_name, rng=self.rng)


class CTRRunner(RankingRunner):
    task = "ctr"

    def __init__(self, model, cfg: RunnerConfig, feat_table=None, mesh=None):
        if not cfg.main_metric:
            cfg.main_metric = tuple(m.strip().upper()
                                    for m in cfg.metrics)[0]
        super().__init__(model, cfg, feat_table, mesh=mesh)
        self.main_metric = cfg.main_metric

    def _loss(self, predictions, batch, params=None):
        probs = jax.nn.sigmoid(predictions[:, 0])
        if self.cfg.loss_n == "MSE":
            err = (probs - batch["label"]) ** 2
            n = jnp.maximum(batch["row_mask"].sum(), 1)
            return jnp.where(batch["row_mask"], err, 0.0).sum() / n
        return bce_ctr_loss(probs, batch["label"], batch["row_mask"])

    def predict(self, builder: FeedBuilder, state):
        preds, labels, users = [], [], []
        rng = jax.random.PRNGKey(self.cfg.seed)
        for feed in builder.batches(self.cfg.eval_batch_size, shuffle=False):
            out = np.asarray(self._jit_eval(state, _device_feed(feed), rng))
            rm = feed["row_mask"]
            preds.append(1 / (1 + np.exp(-out[rm, 0])))
            labels.append(feed["label"][rm])
            users.append(feed["user_id"][rm])
        return (np.concatenate(preds), np.concatenate(labels),
                np.concatenate(users))

    def evaluate(self, builder: FeedBuilder, state, topk=None, metrics=None):
        predictions, labels, users = self.predict(builder, state)
        out = evaluate_ctr(predictions, labels, metrics or self.metrics)
        out["WUAUC"] = evaluate_wuauc(predictions, labels, users)
        return out
