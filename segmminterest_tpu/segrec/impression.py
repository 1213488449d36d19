"""Impression-list losses (the listwise training objectives of
SegRec/models/BaseModel.py ImpressionModel.loss :443-555).

Protocol: predictions (B, P+N) where the first ``max_pos`` slots are (padded)
positive items and the rest (padded) negatives; ``target`` in {1, 0, -1}
with -1 marking padding (ImpressionModel.Dataset pads to fixed lengths,
:586-600 — already the TPU-friendly shape).

Quirks replicated:
 * ``test_have_neg`` reweighting multiplies per-row losses by
   has-negatives indicators normalized to the batch (:493,506,525);
 * BPR 'session' reweights between log and softmax, 'pair' after, 'simple'
   sums raw softplus pairs, default reweights within (:472-483);
 * listnet forces padded softmax probs to 1 so log() zeroes them (:490).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def _masks(target, max_pos):
    mask = jnp.where(target == -1, target, jnp.zeros_like(target)) + 1
    mask = mask.astype(jnp.float32)          # 1 for real items, 0 for pad
    B, L = target.shape
    pos_mask = (jnp.arange(L)[None, :] < max_pos).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask
    test_have_neg = mask[:, max_pos]          # :453 — slot max_pos's validity
    return mask, pos_mask, neg_mask, test_have_neg


def impression_bpr_loss(predictions, target, max_pos, variant: str = "session"):
    """BPR family (:455-483): variant in {session, pair, simple, hard, plain}."""
    mask, pos_mask, neg_mask, _ = _masks(target, max_pos)
    valid_pair = mask[:, :, None] * mask[:, None, :]
    select = pos_mask[:, :, None] * neg_mask[:, None, :] * valid_pair
    diff = predictions[:, :, None] - predictions[:, None, :]
    diff_masked = diff * select

    neg_pred = jnp.where(neg_mask * mask == 1, predictions, NEG_INF)
    neg_softmax = jax.nn.softmax(neg_pred, axis=1)
    if variant == "hard":
        pos_pred = jnp.where(pos_mask * mask == 1, predictions, jnp.inf)
        pos_softmax = jax.nn.softmax(pos_pred.min() - pos_pred, axis=1)
    else:
        pos_pred = jnp.where(pos_mask * mask == 1, predictions, NEG_INF)
        pos_softmax = jax.nn.softmax(pos_pred, axis=1)

    if variant == "pair":
        per_row = ((jax.nn.softplus(-diff_masked)
                    * neg_softmax[:, None, :]).sum(-1) * pos_softmax).sum(-1)
        return per_row.mean()
    if variant == "session" or variant == "hard":
        s = ((jax.nn.sigmoid(diff_masked) * neg_softmax[:, None, :]).sum(-1)
             * pos_softmax).sum(-1)
        return (-jnp.log(jnp.clip(s, 1e-12, None))).mean()
    if variant == "simple":
        return ((jax.nn.softplus(-diff_masked) * select).sum(-1)).sum(-1)
    # default: reweight within log-softmax (:480-482)
    per_row = jax.nn.softplus(
        -(diff_masked * neg_softmax[:, None, :]).sum(-1) * pos_softmax
    ).sum(-1)
    return per_row.mean()


def listnet_loss(predictions, target, max_pos):
    """:485-495."""
    mask, _, _, have_neg = _masks(target, max_pos)
    t = jnp.where(target != -1, target.astype(jnp.float32), NEG_INF)
    t_softmax = jax.nn.softmax(t, axis=1)
    p_softmax = jax.nn.softmax(predictions, axis=1)
    p_softmax = jnp.where(mask == 1, p_softmax, 1.0)
    per_row = -(t_softmax * jnp.log(jnp.clip(p_softmax, 1e-12, None))).sum(1)
    per_row = per_row * have_neg / jnp.maximum(have_neg.sum(), 1e-9) \
        * have_neg.shape[0]
    return per_row.mean()


def softmax_ce_loss(predictions, target, max_pos):
    """:497-508: uniform click probability over the positives."""
    mask, _, _, have_neg = _masks(target, max_pos)
    pos_mask_t = jnp.where(target == 1, target, jnp.zeros_like(target)) \
        .astype(jnp.float32)
    pos_length = pos_mask_t.sum(1)
    p = jnp.where(mask == 1, predictions, -1e5)
    p_softmax = jax.nn.softmax(p - p.max(1, keepdims=True), axis=1)
    target_pre = p_softmax[:, :max_pos]
    target_pre = jnp.where(mask[:, :max_pos] == 1, target_pre, 1.0)
    per_row = -(jnp.log(jnp.clip(target_pre, 1e-12, None))).sum(1) \
        / jnp.maximum(pos_length, 1e-9)
    per_row = per_row * have_neg / jnp.maximum(have_neg.sum(), 1e-9) \
        * have_neg.shape[0]
    return per_row.mean()


def attention_rank_loss(predictions, target, max_pos):
    """:510-527: softmax CE + punishment term on (1 - p)."""
    mask, _, _, have_neg = _masks(target, max_pos)
    t = jnp.where(target != -1, target.astype(jnp.float32), NEG_INF)
    t_softmax = jax.nn.softmax(t, axis=1)
    p = jnp.where(mask == 1, predictions, -1e5)
    p_softmax = jax.nn.softmax(p, axis=1)
    p1 = jnp.where(mask == 1, p_softmax, 1.0)
    loss_1 = -(t_softmax * jnp.log(jnp.clip(p1, 1e-12, None))).sum(1)
    p2 = jnp.where(mask == 1, p_softmax, 0.0)
    p2 = jnp.where(p2 != 1.0, p2, 0.0)
    loss_2 = -((1 - t_softmax)
               * jnp.log(jnp.clip(1 - p2, 1e-12, None))).sum(1)
    per_row = (loss_1 + loss_2) * have_neg \
        / jnp.maximum(have_neg.sum(), 1e-9) * have_neg.shape[0]
    return per_row.mean()


def pointwise_ce_loss(predictions, target, max_pos):
    """:529-534."""
    mask, *_ = _masks(target, max_pos)
    p = jax.nn.sigmoid(predictions)
    t = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    ce = -(t * jnp.log(jnp.clip(p, 1e-12, 1.0))
           + (1 - t) * jnp.log(jnp.clip(1 - p, 1e-12, 1.0)))
    ce = ce * mask
    return (ce.sum(1) / jnp.maximum(mask.sum(1), 1e-9)).mean()


def sampled_softmax_loss(predictions, target, max_pos):
    """:536-545 (Wu et al. 2022)."""
    mask, *_ = _masks(target, max_pos)
    pos_mask_t = jnp.where(target == 1, target, jnp.zeros_like(target)) \
        .astype(jnp.float32)
    num = (jnp.exp(predictions * pos_mask_t) * pos_mask_t).sum(-1)
    den = (jnp.exp(predictions * mask) * mask).sum(-1)
    return (-jnp.log(jnp.clip(num / jnp.maximum(den, 1e-12), 1e-12,
                              None))).mean()


def prob_ce_loss(predictions, target, max_pos):
    """:547-552 (predictions already probabilities)."""
    mask, *_ = _masks(target, max_pos)
    p = jnp.clip(predictions * mask, 1e-12, 1 - 1e-12)
    t = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    ce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)) * mask
    return ce.sum(1).mean()


IMPRESSION_LOSSES = {
    "BPRsession": lambda p, t, m: impression_bpr_loss(p, t, m, "session"),
    "BPRpair": lambda p, t, m: impression_bpr_loss(p, t, m, "pair"),
    "BPRsimple": lambda p, t, m: impression_bpr_loss(p, t, m, "simple"),
    "BPR_hard": lambda p, t, m: impression_bpr_loss(p, t, m, "hard"),
    "BPR": lambda p, t, m: impression_bpr_loss(p, t, m, "plain"),
    "listnet": listnet_loss,
    "softmaxCE": softmax_ce_loss,
    "attention_rank": attention_rank_loss,
    "pointwiseCE": pointwise_ce_loss,
    "sampled_softmax": sampled_softmax_loss,
    "probCE": prob_ce_loss,
}
