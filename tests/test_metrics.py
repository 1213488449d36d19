"""Metric parity tests against per-row oracles re-implementing
/root/reference/MMinterest/models/my_evaluation.py formulas."""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from segmminterest_tpu.engine.evaluation import (
    _auc_score, compute_final_result, iou_sim_batch, main_eval_batch,
    make_results_list, prob_auc_batch, top_k_leave, top_k_leave_mask)


def make_eval_batch(rng, B=64, L=40):
    interests = rng.uniform(0.01, 0.99, size=(B, L))
    gt = np.full((B, L), -2, np.int64)
    for i in range(B):
        dur = rng.integers(1, L + 1)
        if rng.random() < 0.2:
            gt[i, :dur] = 1
        else:
            leave = rng.integers(0, dur)
            gt[i, :leave] = 1
            gt[i, leave] = 0
            gt[i, leave + 1:dur] = -1
    return interests, gt


def test_top_k_leave_no_permutation_matches_reference(rng):
    """Deterministic path (permutation=0): rank = argsort position of the
    leave index (my_evaluation.py:205-209)."""
    interests, gt = make_eval_batch(rng)
    vl = (gt == 1).sum(axis=1)
    got = top_k_leave(interests, vl, gt != -2, permutation=0)
    valid = vl < 40
    ivalid, vvalid = interests[valid], vl[valid]
    sorted_idx = np.argsort(ivalid, axis=1)
    rank = np.argmax(sorted_idx == vvalid[:, None], axis=1) + 1
    for k in (1, 3, 5, 10):
        hit = (rank <= k).astype(np.float32)
        np.testing.assert_allclose(got[f"HR@{k}"], hit.mean(), rtol=1e-6)
        np.testing.assert_allclose(got[f"NDCG@{k}"],
                                   (hit / np.log2(rank + 1)).mean(), rtol=1e-6)


def test_top_k_permutation_breaks_ties_uniformly():
    """All-equal interests: with permutation the leave position must land at a
    uniformly random rank, so HR@k -> k/40."""
    B, L = 20000, 40
    interests = np.ones((B, L)) * 0.5
    vl = np.random.default_rng(0).integers(0, 40, size=B)
    got = top_k_leave(interests, vl, np.ones((B, L), bool), permutation=1,
                      rng=np.random.default_rng(1))
    for k in (1, 5, 10):
        assert abs(got[f"HR@{k}"] - k / 40) < 0.02


def test_top_k_mask_excludes_completed_and_ranks_padding_last(rng):
    interests, gt = make_eval_batch(rng)
    vl = (gt == 1).sum(axis=1)
    mask = gt != -2
    got = top_k_leave_mask(interests, vl, mask, permutation=0)
    valid = vl != mask.sum(axis=1)
    iv = np.where(mask[valid], interests[valid], 1.1)
    sorted_idx = np.argsort(iv, axis=1)
    rank = np.argmax(sorted_idx == vl[valid][:, None], axis=1) + 1
    np.testing.assert_allclose(got["HR@5"],
                               (rank <= 5).astype(np.float32).mean(), rtol=1e-6)


def test_iou_sim_matches_per_row_reference(rng):
    interests, gt = make_eval_batch(rng, B=32)
    h_t = np.cumsum(np.log(interests), axis=1)
    surv = np.exp(h_t)
    vl = (gt == 1).sum(axis=1)
    dur = (gt != -2).sum(axis=1)
    got = iou_sim_batch(surv, gt, vl, dur)
    for i in range(32):
        # reference IoU_Sim (my_evaluation.py:37-56)
        diff = np.abs(gt[i].astype(float) - surv[i])
        I = (1 - diff).tolist()
        I_la = I[:vl[i]] + [1.0] * (dur[i] - vl[i])
        want = sum(I_la) / dur[i]
        np.testing.assert_allclose(got[i], want, rtol=1e-9)


def test_auc_matches_sklearn(rng):
    scores = rng.normal(size=500)
    scores[::7] = scores[0]  # inject ties
    labels = (rng.random(500) < 0.4).astype(int)
    np.testing.assert_allclose(_auc_score(labels, scores),
                               roc_auc_score(labels, scores), rtol=1e-12)


def test_prob_auc_batch_masks_and_relabels(rng):
    interests, gt = make_eval_batch(rng, B=16)
    h_t = np.cumsum(np.log(interests), axis=1)
    surv = np.exp(h_t)
    mask = gt != -2
    got = prob_auc_batch(surv, gt, mask)
    want = roc_auc_score(np.where(gt[mask] == -1, 0, gt[mask]), surv[mask])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_main_eval_batch_and_final_result(rng):
    interests, gt = make_eval_batch(rng, B=48)
    results = make_results_list(["JaccardSim", "LeaveMSE", "LeaveCTR",
                                 "LeaveCTR_view", "TOP_K", "ProbAUC"])
    results = main_eval_batch(interests, gt, results, top_k_permutation=False)
    final = compute_final_result(results)
    assert "HR@5" in final and "LeaveMSE" in final
    assert 0 <= final["HR@5"] <= 1
    # LeaveMSE = MSE(predicted view length, true view length)
    surv = np.exp(np.cumsum(np.log(interests), axis=1))
    pred = np.where(gt != -2, surv, 0).sum(axis=1)
    vl = (gt == 1).sum(axis=1)
    np.testing.assert_allclose(final["LeaveMSE"], ((pred - vl) ** 2).mean(),
                               rtol=1e-9)
    # LeaveCTR averages 1 - interest at the leave slot over rows
    idx = (vl - 1) % 40
    want_ctr = (1 - interests[np.arange(48), idx]).mean()
    np.testing.assert_allclose(final["LeaveCTR"], want_ctr, rtol=1e-9)
