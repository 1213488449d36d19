"""Jitted train/eval engine + the full training loop for the interest task.

Behavioral spec: /root/reference/MMinterest/main_for_seq_leave_earlystop_SegMM.py
(train loop :255-354, valid_model :132-186, final test :365-459) — re-designed
TPU-first:

* one compiled train step (donated state) and one compiled eval step, each at
  a single static batch shape; padded final batches ride a row_mask;
* AdamW + global-norm clip 10.0 via optax (reference :226,298);
* feature gathers happen on device from an HBM-resident table (see
  data/feature_store.py) — the host ships int32 indices only;
* batch sharding over a ('data','model') mesh; gradients are psum'd by XLA.

The reference creates a ReduceLROnPlateau scheduler but never steps it
(main_…SegMM.py:227 — `lr_scheduler.step` is absent), so the learning rate is
constant; replicated here (see PARITY.md).
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.mesh import (make_mesh, batch_sharding, is_multihost,
                         model_axis_size, pad_table_rows,
                         replicated_sharding, sharded_table_gather,
                         table_sharding, to_host_global)
from ..core.numerics import dequantize_rows, l1_normalize, quantize_table_int8
from ..data.dataset import BatchIterator
from ..data.reader import SeqReader
from ..data.feature_store import FeatureStore
from ..models.interest import SegInterestModel
from ..models.losses import compute_loss_dict
from ..utils.config import InterestConfig
from .checkpoint import CheckPointer
from .evaluation import (compute_final_result, compute_final_result_watchtime,
                         main_eval_batch, make_results_list, top_k_leave,
                         top_k_leave_mask)

logger = logging.getLogger(__name__)

DEVICE_KEYS = ("label", "user_identity_id", "photo_identity_id", "vid_mask",
               "user_mask", "row_mask", "photo_lines", "user_lines",
               "play_time", "duration")


def device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k: v for k, v in batch.items() if k in DEVICE_KEYS}


class InterestEngine:
    """Owns the model, optimizer, jitted steps and the device feature table."""

    def __init__(self, config: InterestConfig, n_users: int, n_items: int,
                 feature_table: Optional[np.ndarray] = None,
                 mesh=None):
        self.config = config
        self.feature_mode = feature_table is not None
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.model = SegInterestModel(
            d_model=config.d_model, num_heads=config.nhead,
            num_layers=config.num_layers_enc, ff_dim=config.d_model,
            n_users=n_users, n_items=n_items, dropout=config.dropout,
            user_input=config.user_input_type,
            photo_input=config.photo_input_type,
            fusion_heads=config.fusion_heads,
            learnable_bias=config.learnable_bias, use_pe=config.use_pe,
            ablation=config.ablation_type, dtype=dtype, remat=config.remat,
            remat_scope=config.remat_scope,
            fused_attention=config.fused_attention,
            fuse_projections=config.fuse_projections,
            fuse_qkv=config.fuse_qkv, fuse_dual=config.fuse_dual,
            fuse_layer=config.fuse_layer)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm),
            optax.adamw(config.learning_rate,
                        weight_decay=config.weight_decay))
        exposure = config.exposure_prob or [1.0] * 40
        self.exposure_prob = jnp.asarray(exposure, jnp.float32)

        self.mesh = mesh if mesh is not None else make_mesh(
            jax.devices()[:config.n_devices] if config.n_devices
            else jax.devices())
        self._repl = replicated_sharding(self.mesh)
        self._batch_shard = batch_sharding(self.mesh)
        self._multihost = is_multihost(self.mesh)

        self._table_sharded = False
        self._table_quant = (config.table_quant == "int8"
                             and self.feature_mode)
        if self.feature_mode:
            scale = None

            def _on_device(x):
                # a committed jax.Array (e.g. synthesized directly in HBM —
                # tools/perf_ab.py --table_synth device) is used as-is; the
                # device_put below only (re)applies the sharding, no H2D copy
                return isinstance(x, jax.Array) and not isinstance(
                    x, np.ndarray)

            if self._table_quant:
                # int8 + per-row scale halves the HBM-resident table vs
                # bf16 (PARITY D8); the L1 normalization below makes the
                # scale cancel, leaving rounding error only. A pre-quantized
                # (int8 rows, float32 (N, 1) scales) pair is accepted as-is
                # so callers can quantize chunk-wise at build time instead
                # of materializing the full float table (tools/perf_ab.py).
                if isinstance(feature_table, tuple):
                    table, scale = feature_table
                    # convert per element: a mixed pair (device table, host
                    # scale — plausible, the scale is ~16 MB vs the 4 GB
                    # table) must not pull the committed table back to host
                    if not _on_device(table):
                        table = np.asarray(table)
                    if not _on_device(scale):
                        scale = np.asarray(scale)
                    if table.dtype != np.int8 or scale.dtype != np.float32:
                        raise ValueError(
                            "pre-quantized feature_table must be "
                            "(int8 rows, float32 scales); got "
                            f"({table.dtype}, {scale.dtype})")
                else:
                    table, scale = quantize_table_int8(
                        np.asarray(feature_table))
            else:
                table = (feature_table if _on_device(feature_table)
                         else np.asarray(feature_table))
                if (config.compute_dtype == "bfloat16"
                        and table.dtype != jnp.bfloat16):
                    table = table.astype(jnp.bfloat16)
            def _put(x, sh):
                # an already-committed device array whose sharding is
                # equivalent (e.g. synthesized directly in HBM —
                # tools/perf_ab.py --table_synth device) must NOT be copied:
                # a redundant device_put of the 4 GB production table while
                # the caller still holds the original doubles table
                # residency and OOMs the no-remat step
                if _on_device(x) and x.sharding.is_equivalent_to(sh, x.ndim):
                    return x
                return jax.device_put(x, sh)

            if model_axis_size(self.mesh) > 1:
                # row-shard the table over the model axis: table capacity
                # scales with mesh width (the 3.9M-row production table is
                # ~8 GB — half of one v5e's HBM); gathers become
                # local-gather + psum over 'model' (sharded_table_gather)
                sh = table_sharding(self.mesh)
                table = _put(pad_table_rows(table, self.mesh), sh)
                if scale is not None:
                    scale = _put(pad_table_rows(scale, self.mesh), sh)
                self._table_sharded = True
            else:
                table = _put(table, self._repl)
                if scale is not None:
                    scale = _put(scale, self._repl)
            # quantized tables travel as a (q, scale) pytree through the
            # same jit argument
            self.feat_table = (table, scale) if scale is not None else table
        else:
            self.feat_table = None

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _model_inputs(self, batch, feat_table):
        """Batch dict -> (usr_image, usr_id, usr_mask, vid_image, vid_id,
        vid_mask); in feature mode the gathers + L1 normalization
        (main_…SegMM.py:272-273) run on device here."""
        usr_id = batch["user_identity_id"]
        vid_id = batch["photo_identity_id"]
        vid_mask = batch["vid_mask"]
        usr_mask = batch["user_mask"]
        if self.feature_mode:
            cdt = (jnp.bfloat16 if self.config.compute_dtype == "bfloat16"
                   else jnp.float32)
            if self._table_quant:
                q_tab, q_scale = feat_table
                if self._table_sharded:
                    gather = lambda ids: sharded_table_gather(  # noqa: E731
                        self.mesh, q_tab, jnp.clip(ids, 0), scale=q_scale,
                        out_dtype=cdt)
                else:
                    def gather(ids):
                        ids = jnp.clip(ids, 0)
                        return dequantize_rows(
                            jnp.take(q_tab, ids, axis=0),
                            jnp.take(q_scale, ids, axis=0), cdt)
            elif self._table_sharded:
                gather = lambda ids: sharded_table_gather(  # noqa: E731
                    self.mesh, feat_table, jnp.clip(ids, 0))
            else:
                gather = lambda ids: jnp.take(  # noqa: E731
                    feat_table, jnp.clip(ids, 0), axis=0)
            photo = gather(batch["photo_lines"])
            photo = photo * vid_mask[..., None].astype(photo.dtype)
            user = gather(batch["user_lines"])
            user = user * usr_mask[..., None].astype(user.dtype)
            usr_image = l1_normalize(user)
            vid_image = l1_normalize(photo)
        else:
            usr_image, vid_image = usr_id, vid_id
            usr_mask = jnp.ones((usr_id.shape[0], 1), bool)
        return usr_image, usr_id, usr_mask, vid_image, vid_id, vid_mask

    def _loss_from_logits(self, logits, batch):
        cfg = self.config
        return compute_loss_dict(
            logits.astype(jnp.float32), batch["label"], batch["row_mask"],
            self.exposure_prob, tuple(cfg.loss_type_list), cfg.loss_weight,
            cfg.mask_loss)

    def _train_step_impl(self, params, opt_state, rng, batch, feat_table):
        def loss_fn(p):
            logits = self.model.apply(
                {"params": p}, *self._model_inputs(batch, feat_table),
                deterministic=False,
                rngs={"dropout": rng, "permute": jax.random.fold_in(rng, 1)})
            ld = self._loss_from_logits(logits, batch)
            return ld["loss"], ld
        grads, loss_dict = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_dict

    def _eval_step_impl(self, params, batch, feat_table):
        logits = self.model.apply(
            {"params": params}, *self._model_inputs(batch, feat_table),
            deterministic=True)
        logits = logits.astype(jnp.float32)
        loss_dict = self._loss_from_logits(logits, batch)
        interests = jax.nn.sigmoid(logits) * self.exposure_prob[None, :]
        return loss_dict, logits, interests

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]):
        batch = self.put_batch(example_batch)
        params = self.model.init(
            {"params": rng, "dropout": rng, "permute": rng},
            *self._model_inputs(batch, self.feat_table),
            deterministic=True)["params"]
        params = jax.device_put(params, self._repl)
        opt_state = jax.device_put(self.optimizer.init(params), self._repl)
        return {"params": params, "opt_state": opt_state}

    def batch_transform(self, batch: Dict[str, np.ndarray]):
        """Start the h2d transfer of the device keys and attach the device
        views under '_dev', keeping every host field numpy. Passed as
        BatchIterator(transform=...) so the transfer runs in the prefetch
        thread and overlaps device compute; put_batch then returns the
        already-transferred views. jax.device_put only enqueues the copy, so
        this never blocks the producer. Multi-host placement keeps the
        synchronous path (make_array_from_process_local_data must run on the
        consumer's control flow)."""
        if self._multihost:
            return batch
        out = dict(batch)
        out["_dev"] = {k: jax.device_put(v, self._batch_shard)
                       for k, v in device_batch(batch).items()}
        return out

    def put_batch(self, batch: Dict[str, np.ndarray]):
        if "_dev" in batch:
            return batch["_dev"]
        db = device_batch(batch)
        if self._multihost:
            # every process assembles the same global batch (same files, same
            # seed); each ships only its rows of the DCN-major data axis —
            # the sharded replacement for the reference's per-rank
            # batch_size // world_size split (kn_util/distributed/utils.py:60)
            pid, nproc = jax.process_index(), jax.process_count()

            def put(v):
                assert v.shape[0] % nproc == 0, (
                    f"global batch {v.shape[0]} not divisible by "
                    f"{nproc} processes — pad the batch size")
                per = v.shape[0] // nproc
                local = np.asarray(v[pid * per:(pid + 1) * per])
                return jax.make_array_from_process_local_data(
                    self._batch_shard, local)

            return {k: put(v) for k, v in db.items()}
        return {k: jax.device_put(v, self._batch_shard)
                for k, v in db.items()}

    def train_step(self, state, rng, batch):
        params, opt_state, loss_dict = self._train_step(
            state["params"], state["opt_state"], rng,
            self.put_batch(batch), self.feat_table)
        return {"params": params, "opt_state": opt_state}, loss_dict

    def eval_step(self, state, batch):
        return self._eval_step(state["params"], self.put_batch(batch),
                               self.feat_table)


# ----------------------------------------------------------------------
def _valid_model(engine: InterestEngine, valid_iter: BatchIterator,
                 total_metrics: Dict[str, list], state,
                 rng: Optional[np.random.Generator] = None,
                 max_batches: Optional[int] = None):
    """Validation pass (main_…SegMM.py:132-186): per-batch loss dict + leave
    ranking metrics, averaged over batches."""
    cfg = engine.config
    tmp: Dict[str, list] = {k: [] for k in total_metrics}
    for step, batch in enumerate(valid_iter):
        if max_batches is not None and step >= max_batches:
            break
        loss_dict, _, interests = engine.eval_step(state, batch)
        loss_dict = {k: float(v) for k, v in loss_dict.items()}
        interests = to_host_global(interests)
        gt = batch["label"]
        rm = batch["row_mask"]
        interests, gt = interests[rm], gt[rm]
        view_lengths = (gt == 1).sum(axis=1)
        mask_batch = gt != -2
        if cfg.top_k_mask:
            evaluations = top_k_leave_mask(interests, view_lengths, mask_batch,
                                           permutation=cfg.top_k_permutation,
                                           rng=rng)
        else:
            evaluations = top_k_leave(interests, view_lengths, mask_batch,
                                      permutation=cfg.top_k_permutation,
                                      rng=rng)
        tmp["valid_loss"].append(loss_dict["loss"])
        for key in tmp:
            if key in loss_dict and key != "loss":
                tmp[key].append(loss_dict[key])
            elif key in evaluations:
                tmp[key].append(float(evaluations[key]))
    for key in tmp:
        if tmp[key]:
            total_metrics[key].append(sum(tmp[key]) / len(tmp[key]))
    return total_metrics


def run_training(config: InterestConfig, reader: SeqReader,
                 feature_store: Optional[FeatureStore] = None,
                 work_dir: Optional[str] = None,
                 mesh=None) -> Dict[str, Any]:
    """Full train -> validate -> early-stop -> test pipeline
    (main_…SegMM.py:213-459). Returns dict with final test metrics and the
    checkpoint directory."""
    cfg = config
    work_dir = work_dir or osp.join(cfg.ckpt_dir, cfg.param_dir())
    ckpt = CheckPointer("main_metric", work_dir, mode="max")

    store = feature_store
    feat_table = store.feat if store is not None else None
    engine = InterestEngine(cfg, n_users=reader.n_users,
                            n_items=reader.n_items,
                            feature_table=np.asarray(feat_table)
                            if feat_table is not None else None,
                            mesh=mesh)

    def make_iter(split, batch_size, shuffle, seed):
        return BatchIterator(reader, reader.tables[split], batch_size,
                             shuffle=shuffle, feature_store=store, seed=seed,
                             pool_cap=cfg.pool_cap,
                             transform=engine.batch_transform)

    train_iter = make_iter("train", cfg.train_batch_size, True, cfg.seed)
    valid_iter = make_iter("dev", cfg.valid_batch_size, False, cfg.seed)
    test_iter = make_iter("test", cfg.test_batch_size, False, cfg.seed)

    rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    eval_rng = np.random.default_rng(cfg.seed)
    example = next(iter(valid_iter)) if len(valid_iter) else next(iter(train_iter))
    state = engine.init_state(rng, example)
    start_epoch = 0
    if cfg.load and osp.exists(ckpt.ckpt_latest):
        # resume-from-latest (CheckPointer.load_checkpoint mode='latest',
        # preemption recovery per SURVEY.md §5.3)
        loaded = ckpt.load_checkpoint(state, mode="latest")
        state = loaded["state"]
        start_epoch = int(loaded["num_epochs"])
        logger.info("resumed from %s at epoch %d", ckpt.ckpt_latest,
                    start_epoch)

    total_train_loss: list = []
    total_metrics: Dict[str, list] = {"train_loss": [], "valid_loss": []}
    for lt in cfg.loss_type_list:
        total_metrics[lt] = []
    for et in cfg.eval_types:
        if et == "TOP_K":
            for k in (1, 3, 5, 10):
                for m in ("HR", "NDCG"):
                    total_metrics[f"{m}@{k}"] = []
        else:
            total_metrics[et] = []

    max_valid_batches = 4 if cfg.debug else None
    logger.info("Evaluation before training")
    total_metrics["train_loss"].append(0.0)
    total_metrics = _valid_model(engine, valid_iter, total_metrics, state,
                                 eval_rng, max_valid_batches)

    train_videos_set = set()
    stop_flag = False
    global_step = 0
    step_times: list = []
    n_interactions = 0
    record_dict_list = []
    equal_num: Dict[str, int] = {}
    profiled = False
    for epoch in range(start_epoch, cfg.epochs):
        if stop_flag:
            break
        epoch_st = time.time()
        if cfg.count_view_completion:
            equal_num.setdefault("train", 0)
            equal_num.setdefault("train_all", 0)
        for local_step, batch in enumerate(train_iter):
            if cfg.debug and local_step > 3:
                break
            if cfg.profile and not profiled and local_step == 2:
                # jax.profiler trace of a few steady-state steps (the
                # reference's --debug timing hooks, SURVEY.md §5.1)
                jax.profiler.start_trace(osp.join(work_dir, "profile"))
            st = time.time()
            rng, step_rng = jax.random.split(rng)
            state, loss_dict = engine.train_step(state, step_rng, batch)
            loss = float(loss_dict["loss"])
            if not np.isfinite(loss):
                logger.error("non-finite loss %.4f at step %d — aborting "
                             "(resume with load=True from ckpt-latest)",
                             loss, global_step)
                stop_flag = True
                break
            if cfg.profile and not profiled and local_step == 5:
                jax.profiler.stop_trace()
                profiled = True
                logger.info("profiler trace written to %s",
                            osp.join(work_dir, "profile"))
            if cfg.count_view_completion:
                lab = batch["label"][batch["row_mask"]]
                equal_num["train"] += int(
                    ((lab == 1).sum(1) == (lab != -2).sum(1)).sum())
                equal_num["train_all"] += int(batch["row_mask"].sum())
            total_train_loss.append(loss)
            n_interactions += int(batch["row_mask"].sum())
            global_step += 1
            step_times.append(time.time() - st)
            if cfg.eval_cold:
                train_videos_set.update(
                    batch["video_raw"][batch["row_mask"]].tolist())
            if (local_step + 1) % cfg.logging_step == 0:
                logger.info("train_loss=%.6f step=%d step_time=%.4fs",
                            loss, global_step, step_times[-1])
            if (local_step + 1) % cfg.valid_step == 0:
                total_metrics["train_loss"].append(loss)
                total_metrics = _valid_model(engine, valid_iter, total_metrics,
                                             state, eval_rng,
                                             max_valid_batches)
                main_val = total_metrics[cfg.main_metrics][-1]
                logger.info("valid_loss=%.6f %s=%.6f step=%d",
                            total_metrics["valid_loss"][-1],
                            cfg.main_metrics, main_val, global_step)
                ckpt.save_checkpoint(state, epoch,
                                     metric_vals={"main_metric": main_val})
                if cfg.record_train_detail:
                    # gt/interest tensors per validation for offline
                    # inspection (main_…SegMM.py:241-242,314-327)
                    _, _, tr_int = engine.eval_step(state, batch)
                    record_dict_list.append({
                        "epoch": epoch, "step": local_step,
                        "train_loss": loss,
                        "train_gt": batch["label"][batch["row_mask"]],
                        "train_interests":
                            to_host_global(tr_int)[batch["row_mask"]]})
                history = total_metrics[cfg.main_metrics]
                if cfg.early_stop > 0:
                    if len(history) > cfg.early_stop:
                        last = history[-cfg.early_stop:]
                        if all(last[0] >= y for y in last[1:]):
                            stop_flag = True
                            break
                    if len(history) - history.index(max(history)) > cfg.early_stop:
                        stop_flag = True
                        break
        logger.info("epoch %d done in %.1fs avg_loss=%.6f", epoch,
                    time.time() - epoch_st,
                    sum(total_train_loss) / max(len(total_train_loss), 1))
    if stop_flag:
        logger.info("Early stop based on dev result.")

    result: Dict[str, Any] = {
        "work_dir": work_dir,
        "valid_metrics": total_metrics,
        "steps": global_step,
        "interactions_per_sec": (n_interactions / sum(step_times[1:])
                                 if len(step_times) > 1 else 0.0),
    }
    if cfg.count_view_completion:
        result["view_completion"] = equal_num
        logger.info("view completion counts: %s", equal_num)
    if cfg.record_train_detail and record_dict_list:
        np.save(osp.join(work_dir, "record_logit_gt.npy"),
                np.asarray(record_dict_list, dtype=object),
                allow_pickle=True)
        with open(osp.join(work_dir, "valid_loss_metrics.json"), "w") as f:
            json.dump(total_metrics, f)
    if cfg.plot_curves and total_train_loss:
        # train/valid loss curves (main_…SegMM.py:462-470)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for name, ys in (("train_loss", total_train_loss),
                             ("valid_loss", total_metrics["valid_loss"])):
                plt.figure(figsize=(10, 8))
                plt.plot(range(len(ys)), ys)
                plt.title(name.replace("_", " ").title())
                plt.savefig(osp.join(work_dir, f"{name}.png"))
                plt.close()
        except ImportError:
            logger.warning("matplotlib unavailable; skipping loss curves")

    if cfg.test_model and global_step > 0:
        loaded = ckpt.load_checkpoint(state, mode="best")
        state = loaded["state"]
        results_list = make_results_list(cfg.eval_types)
        cold_results = make_results_list(cfg.eval_types) if cfg.eval_cold else None
        hot_results = make_results_list(cfg.eval_types) if cfg.eval_cold else None
        if cfg.watchtime_metrics:
            for rl in (results_list, cold_results, hot_results):
                if rl is not None:
                    rl["duration_lengths"] = []
                    rl["TOP1MSE"] = []
                    rl["MAES"] = []
                    rl["pred_leave"] = []
        saved_logits = [] if cfg.save_logits else None
        for local_step, batch in enumerate(test_iter):
            if cfg.debug and local_step > 3:
                break
            _, logits, interests = engine.eval_step(state, batch)
            rm = batch["row_mask"]
            interests = to_host_global(interests)[rm]
            gt = batch["label"][rm]
            if cfg.draw_case and local_step == 0:
                # case-study heatmaps for the first rows of the first test
                # batch (my_evaluation.py:233-262 via --draw_case)
                from .evaluation import draw_hotmap
                fig_dir = osp.join(work_dir, "figure")
                for r in range(min(cfg.draw_case, len(gt))):
                    draw_hotmap(interests[r], np.clip(gt[r], 0, 1),
                                f"{batch['user_raw'][rm][r]}-"
                                f"{batch['video_raw'][rm][r]}", fig_dir)
            if saved_logits is not None:
                saved_logits.append(np.concatenate(
                    [interests, gt,
                     batch["user_raw"][rm][:, None],
                     batch["video_raw"][rm][:, None]], axis=1))
            main_eval_batch(interests, gt, results_list,
                            top_k_mask=cfg.top_k_mask,
                            top_k_permutation=cfg.top_k_permutation,
                            logits=(to_host_global(logits)[rm]
                                    if cfg.watchtime_metrics else None),
                            rng=eval_rng)
            if cfg.eval_cold:
                vids = batch["video_raw"][rm]
                cold = ~np.isin(vids, list(train_videos_set))
                if cold.any():
                    main_eval_batch(interests[cold], gt[cold], cold_results,
                                    top_k_mask=cfg.top_k_mask,
                                    top_k_permutation=cfg.top_k_permutation,
                                    rng=eval_rng)
                if (~cold).any():
                    main_eval_batch(interests[~cold], gt[~cold], hot_results,
                                    top_k_mask=cfg.top_k_mask,
                                    top_k_permutation=cfg.top_k_permutation,
                                    rng=eval_rng)
        if cfg.watchtime_metrics:
            n_test = len(results_list.get("view_lengths", []))
            result["test_metrics"] = compute_final_result_watchtime(
                results_list, n_test)
        else:
            result["test_metrics"] = compute_final_result(results_list)
        if cfg.eval_cold:
            result["cold_test_metrics"] = compute_final_result(cold_results)
            result["hot_test_metrics"] = compute_final_result(hot_results)
        if saved_logits is not None and saved_logits:
            arr = np.concatenate(saved_logits, axis=0)
            np.save(osp.join(work_dir, "save_logits_gt_eval.npy"), arr)
        with open(osp.join(work_dir, "final_results.json"), "w") as f:
            json.dump(result["test_metrics"], f, indent=2)
        logger.info("Test result: %s", result["test_metrics"])
    return result
