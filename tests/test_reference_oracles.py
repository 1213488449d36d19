"""Cross-implementation parity: the reference's OWN code as test oracles.

VERDICT r1 items 5/6: the round-1 parity tests compared against torch oracles
re-written from the reference's formulas — a transcription error would pass
both sides. These tests instead execute the reference's actual source from
/root/reference on identical inputs:

 * MMinterest/models/my_evaluation.py — imported directly (standalone module).
 * main_for_seq_leave_earlystop_SegMM.py:compute_final_result — ast-extracted
   (the file itself has a full-width ``）`` typo at :32 that breaks import;
   patched in-memory, never on disk).
 * data_process/get_data_SegMM_public.py:construct_label_1D — ast-extracted
   (the module runs a data pipeline at import time).
 * evaluate_statistics_result_SegMM.py:main/compute_final_result —
   ast-extracted and driven with an in-memory dataloader over the published
   sample csv.
"""

from __future__ import annotations

import ast
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
SAMPLE_CSV = os.path.join(REF, "SegMM_inter_sample.csv")

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference checkout unavailable")


# ---------------------------------------------------------------------------
# oracle loading
# ---------------------------------------------------------------------------

def _load_module_from_path(name, path):
    import importlib.util
    os.environ.setdefault("MPLBACKEND", "Agg")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _extract_functions(path, names, namespace):
    """Execute only the named top-level function defs from a reference file
    (the files themselves run pipelines / have syntax quirks at module level).
    The full-width ``）`` typo is patched in-memory only."""
    with open(path, encoding="utf-8") as f:
        src = f.read().replace("）", "")
    tree = ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name in names]
    missing = set(names) - {n.name for n in keep}
    assert not missing, f"functions {missing} not found in {path}"
    mod = ast.Module(body=keep, type_ignores=[])
    exec(compile(mod, path, "exec"), namespace)
    return namespace


@pytest.fixture(scope="module")
def ref_eval():
    return _load_module_from_path(
        "ref_my_evaluation",
        os.path.join(REF, "MMinterest/models/my_evaluation.py"))


@pytest.fixture(scope="module")
def ref_final_result():
    from sklearn.metrics import mean_squared_error
    ns = _extract_functions(
        os.path.join(REF, "MMinterest/main_for_seq_leave_earlystop_SegMM.py"),
        ["compute_final_result"],
        {"np": np, "mean_squared_error": mean_squared_error})
    return ns["compute_final_result"]


# ---------------------------------------------------------------------------
# shared synthetic batch
# ---------------------------------------------------------------------------

def make_batch(rng, B=64, seq=40):
    labels = np.full((B, seq), -2, np.int64)
    for i in range(B):
        dur = rng.integers(2, seq + 1)
        vl = rng.integers(0, dur + 1)        # vl == dur -> completed view
        labels[i, :dur] = -1
        if vl < dur:
            labels[i, vl] = 0
        labels[i, :vl] = 1
    interests = rng.uniform(1e-4, 1.0, size=(B, seq))  # no ties, log-safe
    return interests, labels


# ---------------------------------------------------------------------------
# metric oracles (my_evaluation.py executed directly)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("permutation", [0, 1])
def test_top_k_leave_matches_reference(ref_eval, rng, permutation):
    from segmminterest_tpu.engine.evaluation import top_k_leave
    interests, labels = make_batch(rng)
    vl = (labels == 1).sum(axis=1, keepdims=True)
    mask = labels != -2
    ref = ref_eval.TOP_K_leave(interests.copy(), vl.copy(), mask.copy(),
                               permutation=permutation)
    ours = top_k_leave(interests, vl, mask, permutation=permutation,
                       rng=np.random.default_rng(0))
    for k in ref:
        assert ours[k] == pytest.approx(float(ref[k]), abs=1e-12), k


@pytest.mark.parametrize("permutation", [0, 1])
def test_top_k_leave_mask_matches_reference(ref_eval, rng, permutation):
    from segmminterest_tpu.engine.evaluation import top_k_leave_mask
    interests, labels = make_batch(rng)
    vl = (labels == 1).sum(axis=1, keepdims=True)
    mask = labels != -2
    ref = ref_eval.TOP_K_leave_mask(interests.copy(), vl.copy(), mask.copy(),
                                    permutation=permutation)
    ours = top_k_leave_mask(interests, vl, mask, permutation=permutation,
                            rng=np.random.default_rng(0))
    for k in ref:
        assert ours[k] == pytest.approx(float(ref[k]), abs=1e-12), k


def test_iou_sim_matches_reference(ref_eval, rng):
    from segmminterest_tpu.engine.evaluation import iou_sim_batch
    interests, labels = make_batch(rng, B=32)
    with np.errstate(divide="ignore"):
        survival = np.exp(np.cumsum(np.log(interests), axis=1))
    vl = (labels == 1).sum(axis=1)
    dur = (labels != -2).sum(axis=1)
    ours = iou_sim_batch(survival, labels, vl, dur)
    for i in range(len(labels)):
        ref = ref_eval.IoU_Sim(torch.tensor(survival[i]),
                               torch.tensor(labels[i], dtype=torch.float64),
                               torch.tensor(int(vl[i])),
                               torch.tensor(int(dur[i])),
                               type="length_aware")
        # the reference divides a python float by an int64 *tensor*, which
        # torch promotes to float32 — its own IoU carries fp32 rounding
        assert ours[i] == pytest.approx(float(ref), abs=1e-6), i


def test_prob_auc_matches_reference(ref_eval, rng):
    from segmminterest_tpu.engine.evaluation import prob_auc_batch
    interests, labels = make_batch(rng)
    mask = labels != -2
    ref = ref_eval.ProbAUC_batch(torch.tensor(interests),
                                 torch.tensor(labels),
                                 torch.tensor(mask.astype(np.int64)))
    ours = prob_auc_batch(interests, labels, mask)
    assert ours == pytest.approx(float(ref), abs=1e-12)


def test_main_eval_batch_matches_reference(ref_eval, ref_final_result, rng):
    """Full per-batch accumulation + final aggregation across 3 batches,
    all six eval types, through the reference's own main_eval_batch
    (my_evaluation.py:264-357) and compute_final_result
    (main_…SegMM.py:188-210)."""
    from segmminterest_tpu.engine.evaluation import (
        compute_final_result, main_eval_batch, make_results_list)

    class Args:
        TOP_K_mask = 0
        TOP_K_permutation = 0
        draw_case = 0

    eval_types = ["JaccardSim", "ProbAUC", "LeaveMSE", "LeaveCTR",
                  "LeaveCTR_view", "TOP_K"]
    ref_results = {et: [] for et in eval_types}
    ref_results["view_lengths"] = []
    ours_results = make_results_list(eval_types)

    for _ in range(3):
        interests, labels = make_batch(rng, B=48)
        t_int = torch.tensor(interests)
        t_lab = torch.tensor(labels)
        pred_label = torch.where(t_int > 0.5, 1.0, 0.0)
        ref_eval.main_eval_batch(Args(), t_int, t_lab, pred_label,
                                 ref_results)
        main_eval_batch(interests, labels, ours_results,
                        top_k_mask=False, top_k_permutation=False)

    ref_final = ref_final_result(ref_results)
    ours_final = compute_final_result(ours_results)
    assert set(ref_final) == set(ours_final)
    for k in ref_final:
        # 1e-6: the reference accumulates HR in np.float32 and JaccardSim
        # through torch's python-float/int64-tensor fp32 promotion
        assert ours_final[k] == pytest.approx(float(ref_final[k]),
                                              rel=1e-6, abs=1e-6), k


# ---------------------------------------------------------------------------
# label codec oracle (get_data_SegMM_public.py executed on the sample csv)
# ---------------------------------------------------------------------------

def test_construct_label_1d_matches_reference(tmp_path, monkeypatch):
    import pandas as pd
    from segmminterest_tpu.data.labels import construct_label_1d

    ns = _extract_functions(
        os.path.join(REF, "data_process/get_data_SegMM_public.py"),
        ["construct_label_1D", "statistic"],
        {"np": np, "pd": pd, "datetime": __import__("datetime").datetime})

    df = pd.read_csv(SAMPLE_CSV).head(2000).copy()
    df = df.rename(columns={"video_id": "photo_id"})
    for col in ("user_id", "photo_id", "time_ms"):
        df[col + "_org"] = df[col]
    # the reference function writes SegMM/SegMM_inter_label1D.csv relative
    # to the cwd; sandbox it
    (tmp_path / "SegMM").mkdir()
    monkeypatch.chdir(tmp_path)
    ref_df = ns["construct_label_1D"](df)

    assert len(ref_df) > 0
    for _, row in ref_df.iterrows():
        ours = construct_label_1d(row["duration_ms"], row["playing_time"])
        np.testing.assert_array_equal(
            ours, np.asarray(row["label_1D"]),
            err_msg=f"dur={row['duration_ms']} play={row['playing_time']}")


# ---------------------------------------------------------------------------
# statistics evaluator oracle (evaluate_statistics_result_SegMM.py:150-330)
# ---------------------------------------------------------------------------

def _ref_stats_format(stats):
    """Adapt our compute_statistics output to the reference's statis_results
    shapes (reference :85-119: per-item positional denominators are the case
    count broadcast to all 40 positions)."""
    out = dict(stats)
    out["num_item_view_duration_pos"] = {
        pid: np.stack([viewed, np.full(len(viewed), cases)])
        for pid, (viewed, cases) in stats["num_item_view_duration_pos"].items()
    }
    return out


@pytest.mark.parametrize("test_type", [
    "all_same", "prob_view_pos_static", "prob_user_view_pos_static",
    "num_item_view_duration_pos_static"])
def test_statistics_evaluator_matches_reference(ref_eval, test_type):
    """Drive the reference's own statistics-baseline evaluator main() on the
    published sample csv (deterministic test types; the stochastic ones
    differ only by the bernoulli draw) and assert our stats_eval pipeline
    produces identical metrics."""
    import tqdm
    from einops import repeat
    from segmminterest_tpu.data.reader import SeqReader
    from segmminterest_tpu.engine.statistics import (compute_statistics,
                                                     synthesize_scores)
    from segmminterest_tpu.engine.evaluation import (
        compute_final_result, main_eval_batch, make_results_list)

    reader = SeqReader.from_single_csv(SAMPLE_CSV, min_interactions=30,
                                       num_warmup=10)
    stats = compute_statistics([reader.tables["train"],
                                reader.tables["dev"]])
    ref_stats = _ref_stats_format(stats)

    from sklearn.metrics import mean_squared_error
    ns = _extract_functions(
        os.path.join(REF, "MMinterest/evaluate_statistics_result_SegMM.py"),
        ["main", "compute_final_result"],
        {"np": np, "torch": torch, "tqdm": tqdm, "repeat": repeat,
         "main_eval_batch": ref_eval.main_eval_batch,
         "mean_squared_error": mean_squared_error,
         "json": __import__("json")})

    class Args:
        eval_cold = ""
        eval_type_list = ["JaccardSim", "ProbAUC", "LeaveMSE", "LeaveCTR",
                          "LeaveCTR_view", "TOP_K"]
        save_logits = 0
        debug = 0
        TOP_K_permutation = 0
        TOP_K_mask = 0
        draw_case = 0
        exposure_prob = [1.0] * 40
        threshold = 0.5

    # in-memory dataloader: same batches for both sides
    t = reader.tables["test"]
    B = 256
    batches = []
    for s in range(0, len(t), B):
        sl = slice(s, s + B)
        batches.append({
            "user_id": torch.tensor(t.user_raw[sl]),
            "photo_id": torch.tensor(t.video_raw[sl]),
            "label": torch.tensor(t.labels[sl]),
        })

    ref_final, _, _ = ns["main"](Args(), batches, ref_stats, test_type)

    ours_results = make_results_list(Args.eval_type_list)
    rng = np.random.default_rng(0)
    for b in batches:
        gt = b["label"].numpy()
        durations = (gt != -2).sum(axis=1)
        scores = synthesize_scores(test_type, stats,
                                   b["user_id"].numpy(),
                                   b["photo_id"].numpy(), durations, rng)
        interests = scores * np.asarray(Args.exposure_prob)[None, :]
        main_eval_batch(interests, gt, ours_results,
                        top_k_mask=False, top_k_permutation=False)
    ours_final = compute_final_result(ours_results)

    for k, v in ref_final.items():
        # fp32 tolerance: see test_main_eval_batch_matches_reference
        assert ours_final[k] == pytest.approx(float(v), rel=1e-6, abs=1e-6), \
            f"{test_type}/{k}"
