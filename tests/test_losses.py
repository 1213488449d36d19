"""Loss-zoo parity tests against an fp64 torch oracle implementing the
reference formulas (/root/reference/MMinterest/models/decoder_leave_focal.py).

The oracle re-expresses each loss exactly as the reference computes it
(including its quirks: mask-ignoring interestBPR, BCE-with-logits on exp(h_t),
full-batch denominators) on ragged/filtered tensors; the framework computes
the same quantities at one static shape with row masks. Values must agree to
~1e-6 at fp64 inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from segmminterest_tpu.models.losses import compute_loss_dict


def make_batch(rng, B=16, L=40, pad_rows=3):
    """Random logits + realistic labels; the last pad_rows rows are padding."""
    logits = rng.normal(size=(B, L)).astype(np.float64)
    gt = np.full((B, L), -2, dtype=np.int64)
    for i in range(B - pad_rows):
        dur = rng.integers(1, L + 1)
        completed = rng.random() < 0.3
        if completed:
            gt[i, :dur] = 1
        else:
            leave = rng.integers(0, dur)
            gt[i, :leave] = 1
            gt[i, leave] = 0
            gt[i, leave + 1:dur] = -1
    row_mask = np.zeros(B, bool)
    row_mask[:B - pad_rows] = True
    return logits, gt, row_mask


def reference_losses(logits, gt, exposure, loss_types, mask_loss=False):
    """The reference compute_loss (decoder_leave_focal.py:490-572) in torch
    fp64, operating on the *real* rows only (no padding — the reference never
    pads)."""
    logits = torch.tensor(logits, dtype=torch.float64)
    gt = torch.tensor(gt)
    mask = gt != -2
    p = torch.sigmoid(logits)
    h_t = torch.cumsum(torch.log(p), dim=1)
    survival = torch.exp(h_t)
    hazard = 1 - survival
    gt_binary = (gt == 1).double()
    view_lengths = gt_binary.sum(dim=1, keepdim=True)
    durations = (gt != -2).double().sum(dim=1, keepdim=True).long()
    hazard_masked = hazard.clone()
    hazard_masked[~mask] = 0
    survival_masked = survival.clone()
    survival_masked[~mask] = 0
    bsz = gt.shape[0]
    out = {}
    for loss in loss_types:
        if loss == "focal":
            g = gt.clone().double()
            g[g > 0] = 1.0
            g[g == -1] = 0.0
            exp_t = torch.tensor(exposure, dtype=torch.float64)[None].repeat(bsz, 1)
            pp = torch.sigmoid(logits) * exp_t
            ce = F.binary_cross_entropy_with_logits(logits, g, reduction="none")
            p_t = pp * g + (1 - pp) * (1 - g)
            l = ce * (1 - p_t) ** 2
            alpha_t = 0.5 * g + 0.5 * (1 - g)
            l = alpha_t * l
            out["focal"] = (l[mask].sum() / bsz).item()
            # the reference mutates gt IN PLACE here (:534-535): losses after
            # 'focal' and the mse2 diagnostic see -1 -> 0
            gt = torch.where(gt == -1, torch.zeros_like(gt), gt)
        elif loss == "huber":
            err = hazard_masked.sum(dim=1) - view_lengths.squeeze(1)
            h = torch.where(err.abs() < 1.0, 0.5 * err ** 2, err.abs() - 0.5)
            out["huber"] = h.mean().item()
        elif loss == "hazard":
            ll = 0.0
            for i in range(bsz):
                t = int(view_lengths[i, 0].item())
                if t == 40:
                    continue
                ll += (torch.log(hazard_masked[i, t] + 1e-6)
                       - torch.log(hazard_masked[i, t:].sum() + 1e-6)).item()
            out["hazard"] = -ll / bsz
        elif loss == "surviveCE":
            exp_p = torch.exp(h_t)
            ce = F.binary_cross_entropy_with_logits(exp_p, gt_binary,
                                                    reduction="none")
            out["surviveCE"] = ((ce * mask).sum() / mask.sum()).item()
        elif loss == "interestBPR":
            vl = view_lengths.long()
            valid = (vl < 40).squeeze(-1)
            lp = logits[valid]
            v = vl[valid].view(-1)
            pos = lp[torch.arange(lp.size(0)), v]
            neg_mask = torch.ones_like(lp, dtype=torch.bool)
            neg_mask[torch.arange(lp.size(0)), v] = False
            neg = lp[neg_mask].view(-1, 39)
            neg_softmax = (neg - neg.max()).softmax(dim=1)
            soft_diff = (neg - pos[:, None]).sigmoid() * neg_softmax
            out["interestBPR"] = (-(soft_diff.sum(dim=1))
                                  .clamp(min=1e-8, max=1 - 1e-8)
                                  .log().mean().item())
        elif loss in ("interestCE", "interestKL"):
            gt_nonleave = (gt != 0).double()
            norm_interest = logits.softmax(dim=1)
            norm_gt = gt_nonleave.softmax(dim=1)
            m = mask.double()
            if loss == "interestCE":
                if mask_loss:
                    v = -torch.sum(m * norm_gt * norm_interest.log(), dim=1) \
                        / m.sum(dim=1)
                    out[loss] = v.mean().item()
                else:
                    out[loss] = -torch.sum(
                        norm_gt * norm_interest.log(), dim=1).mean().item()
            else:
                kl = F.kl_div(norm_interest.log(), norm_gt, reduction="none")
                if mask_loss:
                    v = (kl * m).sum(dim=1) / m.sum(dim=1)
                    out[loss] = v.mean().item()
                else:
                    out[loss] = F.kl_div(norm_interest.log(), norm_gt,
                                         reduction="batchmean").item()
    # the reference keeps the (B, 1) keepdim target, so MSELoss broadcasts to
    # an all-pairs (B, B) mean (decoder_leave_focal.py:552,558) — keep it
    out["mse"] = F.mse_loss(survival_masked.sum(dim=1),
                            view_lengths).item()
    sm = survival_masked.clone()
    for i in range(sm.shape[0]):
        sm[i, durations[i] - 1] = 1
    # gt here reflects the focal in-place mutation when 'focal' ran (:556)
    vl2 = (gt >= 0).sum(dim=1, keepdim=True).double()
    out["mse2"] = F.mse_loss(sm.sum(dim=1), vl2).item()
    return out


ALL_LOSSES = ["focal", "huber", "hazard", "surviveCE", "interestBPR",
              "interestCE", "interestKL"]
WEIGHTS = {k: 1.0 for k in ALL_LOSSES + ["mse"]}


@pytest.mark.parametrize("mask_loss", [False, True])
def test_loss_zoo_matches_reference(rng, mask_loss):
    logits, gt, row_mask = make_batch(rng)
    exposure = rng.uniform(0.5, 1.0, size=40)
    real = row_mask.sum()
    want = reference_losses(logits[:real], gt[:real], exposure, ALL_LOSSES,
                            mask_loss)
    got = compute_loss_dict(jnp.asarray(logits), jnp.asarray(gt),
                            jnp.asarray(row_mask), jnp.asarray(exposure),
                            ALL_LOSSES, WEIGHTS, mask_loss)
    for key, ref_val in want.items():
        np.testing.assert_allclose(float(got[key]), ref_val, rtol=1e-5,
                                   atol=1e-6, err_msg=key)
    total = sum(want[k] for k in ALL_LOSSES)
    np.testing.assert_allclose(float(got["loss"]), total, rtol=1e-5)


def test_padding_rows_do_not_change_losses(rng):
    """Static-shape padding must be a no-op w.r.t. the reference's ragged
    batches."""
    logits, gt, row_mask = make_batch(rng, B=16, pad_rows=0)
    exposure = np.ones(40)
    base = compute_loss_dict(jnp.asarray(logits), jnp.asarray(gt),
                             jnp.asarray(row_mask), jnp.asarray(exposure),
                             ALL_LOSSES, WEIGHTS)
    pad = 5
    logits2 = np.concatenate([logits, rng.normal(size=(pad, 40))])
    gt2 = np.concatenate([gt, np.full((pad, 40), -2, np.int64)])
    rm2 = np.concatenate([row_mask, np.zeros(pad, bool)])
    padded = compute_loss_dict(jnp.asarray(logits2), jnp.asarray(gt2),
                               jnp.asarray(rm2), jnp.asarray(exposure),
                               ALL_LOSSES, WEIGHTS)
    for key in base:
        np.testing.assert_allclose(float(padded[key]), float(base[key]),
                                   rtol=1e-6, err_msg=key)


def test_all_completed_batch_is_finite(rng):
    """view_length == 40 rows everywhere: interestBPR has no valid rows; the
    framework returns 0 instead of the reference's NaN (PARITY.md)."""
    logits = rng.normal(size=(4, 40))
    gt = np.ones((4, 40), np.int64)
    out = compute_loss_dict(jnp.asarray(logits), jnp.asarray(gt),
                            jnp.ones(4, bool), jnp.ones(40),
                            ["interestBPR"], WEIGHTS)
    assert np.isfinite(float(out["loss"]))
    assert float(out["interestBPR"]) == 0.0
