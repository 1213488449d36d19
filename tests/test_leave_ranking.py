"""Leave-frame ranking evaluator vs a transliteration of the ReChorus fork's
evaluate_method (SkipPredBaseline/ReChorus/src/helpers/BaseRunner.py:52-114).

Predictions are tie-free so the random tie-break permutation cannot change
ranks — the two implementations' RNG streams then don't matter (PARITY E1)."""

import numpy as np
import pytest

from segmminterest_tpu.segrec.runner import evaluate_leave_ranking

TOPK = [1, 3, 5]
METRICS = ["HR", "NDCG"]


def oracle(predictions, topk, metrics, durations, data_name):
    predictions = predictions.copy()
    bsz, seq_len = predictions.shape
    if data_name == "KuaiMMstep1Ranking":
        dur = np.broadcast_to(np.asarray(durations)[:, None],
                              (bsz, seq_len))
        predictions = np.where(np.arange(seq_len) < dur, predictions,
                               float("inf"))
    elif "Default" in data_name:
        predictions = predictions[:-1]
        bsz -= 1
    elif data_name == "KuaiMMstep1RankingFill":
        predictions = predictions[:-23]
        bsz -= 23
    elif data_name == "KuaiRand_step1_Ranking_Fill":
        predictions = predictions[:-36]
        bsz -= 36
    permuted = np.array([np.random.permutation(seq_len) for _ in range(bsz)])
    shuffled = np.array([predictions[i, permuted[i]] for i in range(bsz)])
    sorted_indices = np.argsort(shuffled, axis=1)
    target = np.argwhere(permuted == 0)[:, 1]
    gt_rank = np.argmax(sorted_indices == target[:, None], axis=1) + 1
    out = {}
    for k in topk:
        hit = gt_rank <= k
        for m in metrics:
            out[f"{m}@{k}"] = (hit.mean() if m == "HR"
                               else (hit / np.log2(gt_rank + 1)).mean())
    return out


def unique_predictions(rng, bsz, seq_len):
    vals = rng.permutation(bsz * seq_len).astype(np.float64)
    return vals.reshape(bsz, seq_len) / (bsz * seq_len)


@pytest.mark.parametrize("data_name,n_extra", [
    ("SegMMstep1Ranking", 0),
    ("KuaiMMstep1Ranking", 0),
    ("SegMMstep1RankingDefault", 1),
    ("KuaiMMstep1RankingFill", 23),
    ("KuaiRand_step1_Ranking_Fill", 36),
])
def test_leave_ranking_matches_fork(rng, data_name, n_extra):
    bsz, seq_len = 50 + n_extra, 40
    predictions = unique_predictions(rng, bsz, seq_len)
    durations = rng.integers(1, seq_len + 1, size=bsz)
    durations[:] = np.maximum(durations, 1)
    kwargs = {}
    if data_name == "KuaiMMstep1Ranking":
        kwargs["durations"] = durations
    want = oracle(predictions, TOPK, METRICS,
                  durations if data_name == "KuaiMMstep1Ranking" else None,
                  data_name)
    got = evaluate_leave_ranking(predictions, TOPK, METRICS,
                                 data_name=data_name,
                                 rng=np.random.default_rng(7), **kwargs)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], err_msg=f"{data_name}:{k}")


def test_duration_mask_changes_ranks(rng):
    """Out-of-duration candidates must be pushed out of the ranking."""
    bsz, seq_len = 20, 40
    predictions = unique_predictions(rng, bsz, seq_len)
    durations = np.full(bsz, 5)
    full = evaluate_leave_ranking(predictions, [40], ["HR"],
                                  data_name="SegMMstep1Ranking",
                                  rng=np.random.default_rng(0))
    masked = evaluate_leave_ranking(predictions, [5], ["HR"],
                                    durations=durations,
                                    data_name="KuaiMMstep1Ranking",
                                    rng=np.random.default_rng(0))
    assert full["HR@40"] == 1.0      # every target ranks within 40
    assert masked["HR@5"] == 1.0     # only 5 in-duration candidates remain
