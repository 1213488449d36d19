"""Watch-time prediction CLI: WLR / D2Q / TPM baselines and Ours.

Behavioral spec: /root/reference/MMinterest/watchtime/
  main_for_WatchTime_WLR.py  — BCE on play_time > 60th-percentile threshold;
        test: expected watch time = p * duration, HR1 (exact segment match of
        the rounded prediction) + MAE against play clamped to 40.
  main_for_WatchTime_D2Q.py  — MSE regression on min(play/40, 1); test preds
        round(output * 40).
  main_for_WatchTime_TPM.py  — tree label-encoding BCE + MSE on expected
        playtime + variance regularizer (Adam); test preds round(expected).
  main_for_WatchTime_Ours_SegMM.py — the skip-prediction harness with
        watch-time metrics (LeaveMSE->(MSE,MAE), TOP1MSE, MAES/pred_leave);
        run via ``--method ours`` which delegates to the training engine with
        watchtime_metrics enabled.

  python -m segmminterest_tpu.tasks.watchtime --method wlr \
      --sample_csv /root/reference/SegMM_inter_sample.csv \
      --min_interactions 30 --num_warmup 10 --epochs 1
"""

from __future__ import annotations

import argparse
import json
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import BatchIterator
from ..data.reader import SeqReader
from ..models.watchtime import (D2QModel, TreeModel, playtime_percentiles,
                                tpm_encoded_playtime, tpm_loss)

logger = logging.getLogger(__name__)


def _bce(probs, labels, row_mask):
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    ce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    return (ce * row_mask).sum() / jnp.maximum(row_mask.sum(), 1)


def _mse(pred, target, row_mask):
    return (jnp.square(pred - target) * row_mask).sum() \
        / jnp.maximum(row_mask.sum(), 1)


def _early_stop_min(history, patience):
    if patience <= 0 or len(history) <= patience:
        return False
    last = history[-patience:]
    if all(last[0] <= y for y in last[1:]):
        return True
    return len(history) - history.index(min(history)) > patience


def run_wlr_or_d2q(args, reader, method: str):
    train_t = reader.tables["train"]
    q_threshold = float(np.quantile(train_t.playing_time / 5000.0, 0.6))
    model = D2QModel(max_item=reader.n_items, max_user=reader.n_users)
    tx = optax.adagrad(args.learning_rate)

    def fwd(params, batch):
        return model.apply({"params": params}, batch["user_identity_id"],
                           batch["photo_identity_id"],
                           jnp.clip(batch["duration"], 0, 199))[:, 0]

    def loss_fn(params, batch):
        out = fwd(params, batch)
        rm = batch["row_mask"].astype(jnp.float32)
        play = batch["play_time"].astype(jnp.float32)
        if method == "wlr":
            label = (play > q_threshold).astype(jnp.float32)
            return _bce(out, label, rm)
        label = jnp.minimum(play / 40.0, 1.0)
        return _mse(out, label, rm)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_loss = jax.jit(loss_fn)
    fwd_jit = jax.jit(fwd)

    def make_iter(split, shuffle):
        return BatchIterator(reader, reader.tables[split], args.batch_size,
                             shuffle=shuffle, seed=args.seed)

    rng = jax.random.PRNGKey(args.seed)
    example = next(iter(make_iter("train", False)))
    dev = {k: jnp.asarray(v) for k, v in example.items()
           if k in ("user_identity_id", "photo_identity_id", "duration",
                    "play_time", "row_mask")}
    params = model.init(rng, dev["user_identity_id"],
                        dev["photo_identity_id"],
                        jnp.clip(dev["duration"], 0, 199))["params"]
    opt_state = tx.init(params)

    valid_losses = []
    stop = False
    for epoch in range(args.epochs):
        if stop:
            break
        for step, batch in enumerate(make_iter("train", True)):
            if args.debug and step > 5:
                break
            params, opt_state, loss = train_step(params, opt_state, batch)
            if (step + 1) % args.valid_step == 0:
                vl = float(np.mean([float(eval_loss(params, b))
                                    for b in make_iter("dev", False)]))
                valid_losses.append(vl)
                logger.info("epoch %d step %d valid_loss %.6f", epoch, step, vl)
                if _early_stop_min(valid_losses, args.early_stop):
                    stop = True
                    break

    # test (WLR :167-198, D2Q :160-190)
    labels_all, preds_all = [], []
    for batch in make_iter("test", False):
        out = np.asarray(fwd_jit(params, batch))
        rm = batch["row_mask"]
        play = batch["play_time"].astype(np.float64)
        if method == "wlr":
            expected = out * batch["duration"]
            label = np.minimum(play, 40).astype(np.int64)
            preds = np.round(expected)
        else:
            label = (np.minimum(play / 40.0, 1.0) * 40).astype(np.int64)
            preds = np.round(out * 40)
        labels_all.append(label[rm])
        preds_all.append(preds[rm])
    labels_all = np.concatenate(labels_all)
    preds_all = np.concatenate(preds_all)
    hr1 = float((labels_all == preds_all).mean())
    mae = float(np.abs(labels_all - preds_all).mean())
    return {"HR1": hr1, "MAE": mae, "threshold": q_threshold}


def run_tpm(args, reader):
    train_t = reader.tables["train"]
    begins, ends = playtime_percentiles(train_t.playing_time, args.wr_bucknum)
    begins, ends = jnp.asarray(begins), jnp.asarray(ends)
    model = TreeModel(max_item=reader.n_items, max_user=reader.n_users,
                      class_num=args.wr_bucknum - 1, dropout=0.2)
    tx = optax.adam(args.learning_rate)

    def node_probs(params, batch, deterministic, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return model.apply({"params": params}, batch["user_identity_id"],
                           batch["photo_identity_id"],
                           jnp.clip(batch["duration"], 0, 199),
                           deterministic=deterministic, rngs=rngs)

    def loss_fn(params, batch, rng, deterministic):
        probs = node_probs(params, batch, deterministic, rng)
        rm = batch["row_mask"].astype(jnp.float32)
        play = batch["play_time"].astype(jnp.float32)
        target = jnp.minimum(play / 40.0, 1.0) * 40.0
        loss, _ = tpm_loss(probs, target, begins, ends, args.wr_bucknum,
                           args.mse_weight, args.var_weight, rm)
        return loss

    @partial(jax.jit, static_argnums=())
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng, False))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_loss = jax.jit(lambda p, b: loss_fn(p, b, None, True))

    @jax.jit
    def predict(params, batch):
        probs = node_probs(params, batch, True)
        expected, _ = tpm_encoded_playtime(probs, args.wr_bucknum, begins, ends)
        return expected[:, 0]

    def make_iter(split, shuffle):
        return BatchIterator(reader, reader.tables[split], args.batch_size,
                             shuffle=shuffle, seed=args.seed)

    rng = jax.random.PRNGKey(args.seed)
    example = next(iter(make_iter("train", False)))
    params = model.init({"params": rng, "dropout": rng},
                        jnp.asarray(example["user_identity_id"]),
                        jnp.asarray(example["photo_identity_id"]),
                        jnp.clip(jnp.asarray(example["duration"]), 0, 199),
                        deterministic=True)["params"]
    opt_state = tx.init(params)

    valid_losses = []
    stop = False
    for epoch in range(args.epochs):
        if stop:
            break
        for step, batch in enumerate(make_iter("train", True)):
            if args.debug and step > 5:
                break
            rng, k = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, batch, k)
            if (step + 1) % args.valid_step == 0:
                vl = float(np.mean([float(eval_loss(params, b))
                                    for b in make_iter("dev", False)]))
                valid_losses.append(vl)
                logger.info("epoch %d step %d valid_loss %.6f", epoch, step, vl)
                if _early_stop_min(valid_losses, args.early_stop):
                    stop = True
                    break

    labels_all, preds_all = [], []
    for batch in make_iter("test", False):
        expected = np.asarray(predict(params, batch))
        rm = batch["row_mask"]
        play = batch["play_time"].astype(np.float64)
        label = (np.minimum(play / 40.0, 1.0) * 40).astype(np.int64)
        labels_all.append(label[rm])
        preds_all.append(np.round(expected)[rm])
    labels_all = np.concatenate(labels_all)
    preds_all = np.concatenate(preds_all)
    return {"HR1": float((labels_all == preds_all).mean()),
            "MAE": float(np.abs(labels_all - preds_all).mean())}


def run_ours(args, reader):
    from ..engine.train import run_training
    from .skip_train import config_from_args
    cfg = config_from_args(args)
    cfg = cfg.replace(
        eval_type_list="JaccardSim,LeaveMSE,LeaveCTR,LeaveCTR_view,TOP_K",
        watchtime_metrics=True)
    return run_training(cfg, reader)["test_metrics"]


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from .skip_train import build_parser
    p = build_parser()
    p.add_argument("--method", type=str, default="wlr",
                   choices=["wlr", "d2q", "tpm", "ours"])
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--wr_bucknum", type=int, default=32)
    p.add_argument("--mse_weight", type=float, default=0.2)
    p.add_argument("--var_weight", type=float, default=0.1)
    args = p.parse_args(argv)

    if args.sample_csv:
        reader = SeqReader.from_single_csv(
            args.sample_csv, min_interactions=args.min_interactions,
            num_warmup=args.num_warmup)
    else:
        reader = SeqReader.from_dir(args.path, sep=args.sep)

    if args.method in ("wlr", "d2q"):
        result = run_wlr_or_d2q(args, reader, args.method)
    elif args.method == "tpm":
        result = run_tpm(args, reader)
    else:
        result = run_ours(args, reader)
    print(json.dumps(result, indent=2, default=str))
    return result


if __name__ == "__main__":
    main()
