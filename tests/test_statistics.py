"""Statistics-baseline tests: the bincount implementation vs a per-row-loop
oracle transliterating the reference's statistics_dataset
(evaluate_statistics_result_SegMM.py:28-119), plus the canonical logit export
(save_logits_for_statistics_SegMM.py:127-200)."""

import json
from types import SimpleNamespace

import numpy as np
import pytest

from segmminterest_tpu.engine.statistics import (L, TEST_TYPES,
                                                 compute_statistics,
                                                 synthesize_scores)

SAMPLE = "/root/reference/SegMM_inter_sample.csv"


def make_table(rng, n):
    labels = np.full((n, L), -2, np.int64)
    for i in range(n):
        dur = rng.integers(1, L + 1)
        vl = rng.integers(0, dur + 1)
        labels[i, :vl] = 1
        if vl < dur:
            labels[i, vl] = 0
            labels[i, vl + 1:dur] = -1
    return SimpleNamespace(labels=labels,
                           user_raw=rng.integers(1, 9, size=n),
                           video_raw=rng.integers(1, 30, size=n))


def oracle_statistics(tables):
    """Per-row loop, structured like the reference accumulation (:60-101)."""
    num_view_all = num_duration_all = count_case = 0
    num_view_pos = np.zeros(L)
    num_leave_pos = np.zeros(L + 1)
    user_pos, user_all, item_pos, item_all = {}, {}, {}, {}
    for t in tables:
        for row, uid, pid in zip(t.labels, t.user_raw, t.video_raw):
            vl = int((row == 1).sum())
            dur = int((row != -2).sum())
            num_view_all += vl
            num_duration_all += dur
            count_case += 1
            num_view_pos[:vl] += 1
            if vl < L:
                num_view_pos[vl + 1:] += 1
            num_leave_pos[vl] += 1
            for d, key in ((user_pos, int(uid)), (item_pos, int(pid))):
                if key not in d:
                    d[key] = np.zeros((2, L))
                d[key][0, :vl] += 1
                if vl < L:
                    d[key][0, vl + 1:] += 1
                d[key][1, :] += 1
            for d, key in ((user_all, int(uid)), (item_all, int(pid))):
                d.setdefault(key, [0, 0])
                d[key][0] += vl
                d[key][1] += dur
    return {
        "prob_view_all": num_view_all / num_duration_all,
        "prob_view_pos": num_view_pos / count_case,
        "prob_leave_pos": num_leave_pos / num_leave_pos.sum(),
        "user_pos": user_pos, "user_all": user_all,
        "item_pos": item_pos, "item_all": item_all,
    }


def test_compute_statistics_matches_loop_oracle(rng):
    tables = [make_table(rng, 200), make_table(rng, 77)]
    got = compute_statistics(tables)
    want = oracle_statistics(tables)
    np.testing.assert_allclose(got["prob_view_all"], want["prob_view_all"])
    np.testing.assert_allclose(got["prob_view_pos"], want["prob_view_pos"])
    np.testing.assert_allclose(got["prob_leave_pos"], want["prob_leave_pos"])
    for uid, (v, d) in want["user_all"].items():
        np.testing.assert_allclose(got["prob_user_view_all"][uid],
                                   0.0 if d == 0 else v / d)
    for uid, arr in want["user_pos"].items():
        np.testing.assert_allclose(got["prob_user_view_pos"][uid],
                                   arr[0] / arr[1])
    for pid, arr in want["item_pos"].items():
        gp, gc = got["num_item_view_duration_pos"][pid]
        np.testing.assert_allclose(gp, arr[0])
        np.testing.assert_allclose(gc * np.ones(L), arr[1])


@pytest.mark.parametrize("test_type", TEST_TYPES)
def test_synthesize_scores_shapes_and_ranges(rng, test_type):
    tables = [make_table(rng, 120)]
    stats = compute_statistics(tables)
    t = tables[0]
    durations = (t.labels != -2).sum(axis=1)
    scores = synthesize_scores(test_type, stats, t.user_raw, t.video_raw,
                               durations, rng)
    assert scores.shape == (120, L)
    assert np.isfinite(scores).all()
    assert (scores >= 0).all() and (scores <= 1).all()
    if test_type == "all_same":
        assert (scores == 1).all()
    if test_type in ("prob_view_pos", "prob_user_view_pos",
                     "prob_view_duration_pos"):  # bernoulli-sampled
        assert set(np.unique(scores)) <= {0.0, 1.0}


def test_export_statistics_logits_end_to_end(tmp_path):
    from segmminterest_tpu.tasks.export_statistics_logits import main
    paths = main(["--sample_csv", SAMPLE, "--min_interactions", "30",
                  "--num_warmup", "10", "--batch_size", "256",
                  "--test_types", "all_same,prob_user_view_pos",
                  "--out_dir", str(tmp_path)])
    assert len(paths) == 2
    from segmminterest_tpu.data.reader import SeqReader
    reader = SeqReader.from_single_csv(SAMPLE, min_interactions=30,
                                       num_warmup=10)
    n_total = sum(len(reader.tables[s]) for s in ("train", "dev", "test"))
    for p in paths:
        d = json.load(open(p))
        assert len(d) == n_total
        key, row = next(iter(d.items()))
        uid, pid, tms = key.split("-")
        assert int(uid) > 0 and int(pid) > 0 and int(tms) > 0
        assert len(row) == 40
    # all_same x ones exposure == all-ones rows
    d = json.load(open(paths[0]))
    assert all(v == [1.0] * 40 for v in list(d.values())[:20])


def test_export_rejects_unknown_type(tmp_path):
    from segmminterest_tpu.tasks.export_statistics_logits import main
    with pytest.raises(SystemExit):
        main(["--sample_csv", SAMPLE, "--min_interactions", "30",
              "--num_warmup", "10", "--test_types", "bogus",
              "--out_dir", str(tmp_path)])
