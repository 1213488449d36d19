"""Survival-analysis loss zoo for segment-level interest modeling.

Behavioral spec: /root/reference/MMinterest/models/decoder_leave_focal.py
(my_sigmoid_focal_loss :35-59, huber_loss :61-66, compute_leave_prob_CE
:68-97, compute_interest_leave_CE :99-161, compute_interest_BPR_all :163-221,
compute_partial_likelihood_loss :273-286, compute_loss :490-572).

Every function is a pure map over fixed-shape arrays:
    logits  (B, L)  per-segment interest logits (bias already added)
    gt      (B, L)  leave labels in {1, 0, -1, -2}:
                    1 watched, 0 leave segment, -1 unwatched, -2 padding
    row_mask (B,)   True for real rows (False for batch padding) — replaces
                    the reference's variable-shape boolean row filtering with
                    mask-and-count so everything jits at one static shape.

Deliberate deviations from the reference (logged in PARITY.md):
  * empty-valid-row batches return 0 instead of NaN (mean over empty tensor);
  * log(sigmoid(x)) is computed as log_sigmoid(x) (identical, stable).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.numerics import survival_from_logits


def _seg_iota(gt):
    return jnp.arange(gt.shape[1])[None, :]


def label_components(gt: jax.Array, row_mask: jax.Array):
    """Shared label-derived quantities (decoder_leave_focal.py:493-527)."""
    mask = (gt != -2) & row_mask[:, None]
    gt_binary = ((gt == 1) & row_mask[:, None]).astype(jnp.float32)
    view_lengths = gt_binary.sum(axis=1)                 # (B,)
    durations = mask.astype(jnp.int32).sum(axis=1)       # (B,)
    return mask, gt_binary, view_lengths, durations


def focal_loss(logits, gt, mask, row_mask, exposure_prob,
               alpha: float = 0.5, gamma: float = 2.0):
    """Exposure-corrected sigmoid focal loss, summed over valid positions and
    divided by the (real) batch size (decoder_leave_focal.py:35-59,534-538).

    Targets follow the in-place relabeling gt[gt>0]=1, gt[gt==-1]=0; padding
    positions are masked out of the sum so their target value is irrelevant.
    """
    targets = jnp.where(gt > 0, 1.0, 0.0)
    p = jax.nn.sigmoid(logits) * exposure_prob[None, :]
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * loss
    bsz = jnp.maximum(row_mask.sum(), 1)
    return jnp.where(mask, loss, 0.0).sum() / bsz


def huber_on_hazard(hazard_masked, view_lengths, row_mask, delta: float = 1.0):
    """Huber(sum_t hazard, view_length) (decoder_leave_focal.py:61-66,539-540)."""
    err = hazard_masked.sum(axis=1) - view_lengths
    h = jnp.where(jnp.abs(err) < delta, 0.5 * err ** 2,
                  delta * (jnp.abs(err) - 0.5 * delta))
    n = jnp.maximum(row_mask.sum(), 1)
    return jnp.where(row_mask, h, 0.0).sum() / n


def cox_partial_likelihood(hazard_masked, view_lengths, row_mask):
    """Cox partial likelihood over the leave position
    (decoder_leave_focal.py:273-286). Rows with view_length == L are skipped
    but still counted in the denominator, matching the reference."""
    B, L = hazard_masked.shape
    vl = view_lengths.astype(jnp.int32)
    valid = (vl < L) & row_mask
    vl_safe = jnp.clip(vl, 0, L - 1)
    h_at = jnp.take_along_axis(hazard_masked, vl_safe[:, None], axis=1)[:, 0]
    risk = jnp.where(_seg_iota(hazard_masked) >= vl_safe[:, None],
                     hazard_masked, 0.0).sum(axis=1)
    ll = jnp.log(h_at + 1e-6) - jnp.log(risk + 1e-6)
    n = jnp.maximum(row_mask.sum(), 1)
    return -jnp.where(valid, ll, 0.0).sum() / n


def survive_ce(h_t, gt_binary, mask):
    """BCE-with-logits applied to exp(h_t)=S(t) as if it were a logit —
    a reference quirk kept verbatim (decoder_leave_focal.py:68-97)."""
    s = jnp.exp(h_t)
    ce = jnp.maximum(s, 0) - s * gt_binary + jnp.log1p(jnp.exp(-jnp.abs(s)))
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, ce, 0.0).sum() / denom


def interest_bpr_all(logits, view_lengths, row_mask):
    """The paper's main loss: softmax-weighted soft-BPR of the leave position
    against all other segments (decoder_leave_focal.py:163-221).

    Reference notes: rows with view_length >= L are filtered out; the `mask`
    argument is accepted but ignored; the global-max subtraction before the
    softmax is a no-op we omit.
    """
    B, L = logits.shape
    vl = view_lengths.astype(jnp.int32)
    valid = (vl < L) & row_mask
    vl_safe = jnp.clip(vl, 0, L - 1)
    pos = jnp.take_along_axis(logits, vl_safe[:, None], axis=1)  # (B,1)
    is_pos = _seg_iota(logits) == vl_safe[:, None]
    neg_softmax = jax.nn.softmax(jnp.where(is_pos, -jnp.inf, logits), axis=1)
    soft_diff = jax.nn.sigmoid(logits - pos) * neg_softmax
    s = jnp.clip(soft_diff.sum(axis=1), 1e-8, 1.0 - 1e-8)
    per_row = -jnp.log(s)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_row, 0.0).sum() / n


def interest_leave_ce(logits, gt, mask, row_mask, kind: str = "CE",
                      use_mask: bool = False):
    """Softmax-interest vs non-leave-distribution CE / KL
    (decoder_leave_focal.py:99-161). The softmaxes run over the full 40 slots
    including padding, exactly like the reference."""
    gt_nonleave = (gt != 0).astype(jnp.float32)
    log_interest = jax.nn.log_softmax(logits, axis=1)
    norm_gt = jax.nn.softmax(gt_nonleave, axis=1)
    n_rows = jnp.maximum(row_mask.sum(), 1)
    maskf = mask.astype(jnp.float32)
    if kind == "CE":
        if use_mask:
            per_row = -(maskf * norm_gt * log_interest).sum(axis=1) \
                / jnp.maximum(maskf.sum(axis=1), 1)
        else:
            per_row = -(norm_gt * log_interest).sum(axis=1)
        return jnp.where(row_mask, per_row, 0.0).sum() / n_rows
    elif kind == "KL":
        # torch F.kl_div(input=log_interest, target=norm_gt):
        #   target * (log(target) - input), with 0 where target == 0.
        elem = jnp.where(norm_gt > 0,
                         norm_gt * (jnp.log(jnp.maximum(norm_gt, 1e-38))
                                    - log_interest), 0.0)
        if use_mask:
            per_row = (elem * maskf).sum(axis=1) \
                / jnp.maximum(maskf.sum(axis=1), 1)
            return jnp.where(row_mask, per_row, 0.0).sum() / n_rows
        # reduction="batchmean": total sum / batch size
        per_row = elem.sum(axis=1)
        return jnp.where(row_mask, per_row, 0.0).sum() / n_rows
    raise ValueError(f"unknown kind {kind}")


def mse_diagnostics(survival_masked, gt, view_lengths, durations, row_mask):
    """Always-computed diagnostics (decoder_leave_focal.py:552-558):
      mse : MSE(sum_t S_masked, view_length)
      mse2: same after forcing S_masked[duration-1] = 1, against the
            view count including the leave slot ((gt >= 0).sum).
    """
    n = jnp.maximum(row_mask.sum(), 1)
    pred = survival_masked.sum(axis=1)

    def broadcast_mse(inp, tgt):
        # the reference feeds nn.MSELoss a (B,) input against a (B, 1) target
        # (decoder_leave_focal.py:552,558 — view_lengths keeps keepdim=True),
        # so torch broadcasts to (B, B) and averages ALL input/target pairs.
        # Replicated exactly (it is a logged diagnostic); padded rows are
        # excluded from both axes.
        diff = inp[None, :] - tgt[:, None]
        pair_mask = row_mask[None, :] & row_mask[:, None]
        return jnp.where(pair_mask, diff * diff, 0.0).sum() / (n * n)

    mse1 = broadcast_mse(pred, view_lengths.astype(pred.dtype))
    dur_idx = jnp.clip(durations - 1, 0, gt.shape[1] - 1)
    at_dur = jnp.take_along_axis(survival_masked, dur_idx[:, None], axis=1)[:, 0]
    pred2 = pred - at_dur + 1.0
    vl2 = ((gt >= 0) & row_mask[:, None]).sum(axis=1).astype(pred.dtype)
    mse2 = broadcast_mse(pred2, vl2)
    return mse1, mse2


def compute_loss_dict(logits: jax.Array, gt: jax.Array, row_mask: jax.Array,
                      exposure_prob: jax.Array,
                      loss_types: Sequence[str],
                      loss_weights: Dict[str, float],
                      mask_loss: bool = False) -> Dict[str, jax.Array]:
    """The decoder's compute_loss (decoder_leave_focal.py:490-572) as a pure
    function. Returns every requested loss, the mse/mse2 diagnostics, and the
    weighted total under key "loss"."""
    mask, gt_binary, view_lengths, durations = label_components(gt, row_mask)
    h_t, survival, hazard = survival_from_logits(logits)
    hazard_masked = jnp.where(mask, hazard, 0.0)
    survival_masked = jnp.where(mask, survival, 0.0)

    out: Dict[str, jax.Array] = {}
    # the reference's focal branch mutates gt IN PLACE (gt[gt>0]=1,
    # gt[gt==-1]=0, decoder_leave_focal.py:534-535): every loss listed after
    # 'focal' — and the mse2 diagnostic, always computed last — sees the
    # mutated labels. Replicated by threading gt_cur through in list order.
    gt_cur = gt
    for lt in loss_types:
        if lt == "focal":
            out["focal"] = focal_loss(logits, gt_cur, mask, row_mask,
                                      exposure_prob)
            gt_cur = jnp.where(gt_cur == -1, 0, gt_cur)
        elif lt == "huber":
            out["huber"] = huber_on_hazard(hazard_masked, view_lengths, row_mask)
        elif lt == "hazard":
            out["hazard"] = cox_partial_likelihood(hazard_masked, view_lengths,
                                                   row_mask)
        elif lt == "surviveCE":
            out["surviveCE"] = survive_ce(h_t, gt_binary, mask)
        elif lt == "interestBPR":
            out["interestBPR"] = interest_bpr_all(logits, view_lengths, row_mask)
        elif lt == "interestCE":
            out["interestCE"] = interest_leave_ce(logits, gt_cur, mask, row_mask,
                                                  "CE", mask_loss)
        elif lt == "interestKL":
            out["interestKL"] = interest_leave_ce(logits, gt_cur, mask, row_mask,
                                                  "KL", mask_loss)
        else:
            raise ValueError(f"unknown loss type: {lt}")

    mse1, mse2 = mse_diagnostics(survival_masked, gt_cur, view_lengths,
                                 durations, row_mask)
    out["mse"] = mse1
    out["mse2"] = mse2

    total = jnp.asarray(0.0, logits.dtype)
    for lt in loss_types:
        # 'huber' is weighted by the 'mse' coefficient (reference :561-566)
        coef = loss_weights["mse"] if lt == "huber" else loss_weights[lt]
        total = total + out[lt] * coef
    out["loss"] = total
    return out
