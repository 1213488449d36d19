"""Task-CLI regression tests: dataset construction, watch-time baselines,
the baseline-logits converter, and the multi-seed sweep harness."""

import json
import os
import os.path as osp

import numpy as np
import pandas as pd
import pytest

SAMPLE = "/root/reference/SegMM_inter_sample.csv"


def test_build_interactions_segmm(tmp_path):
    """D3: filters + label_1D + splits + warm-up dict + id maps +
    exposure table (get_data_SegMM_public.py)."""
    from segmminterest_tpu.tasks.build_interactions import main
    out = str(tmp_path / "segmm")
    main(["--inter_csv", SAMPLE, "--out", out,
          "--min_interactions", "30", "--num_warmup", "10"])
    files = set(os.listdir(out))
    assert {"train.csv", "dev.csv", "test.csv",
            "user_input_dict.json"} <= files
    train = pd.read_csv(osp.join(out, "train.csv"), sep="\t")
    assert "label_1D" in train.columns
    # label strings parse back to valid {1,0,-1} vectors (padding added later)
    from segmminterest_tpu.data.labels import parse_label_1d
    lab = parse_label_1d(train["label_1D"].iloc[0])
    assert set(np.unique(lab)) <= {1, 0, -1}
    # warm-up dict keys are "{photo}_{frame}" strings per user
    warm = json.load(open(osp.join(out, "user_input_dict.json")))
    some = next(iter(warm.values()))
    assert all("_" in s for s in some)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["wlr", "d2q", "tpm", "ours"])
def test_watchtime_baselines(tmp_path, method):
    """A12-A14: the watch-time baseline trainers produce finite MAE/HR1
    (main_for_WatchTime_{WLR,D2Q,TPM}.py)."""
    from segmminterest_tpu.tasks.watchtime import main
    extra = (["--d_model", "32", "--nhead", "4", "--num_layers_enc", "2",
              "--user_input_type", "id", "--photo_input_type", "id",
              "--valid_step", "2", "--early_stop", "0"]
             if method == "ours" else [])
    result = main(["--sample_csv", SAMPLE, "--min_interactions", "30",
                   "--num_warmup", "10", "--method", method,
                   "--epochs", "1", "--debug", "1", "--batch_size", "256",
                   "--train_batch_size", "128", "--test_batch_size", "128",
                   "--valid_batch_size", "128",
                   "--ckpt_dir", str(tmp_path)] + extra)
    flat = json.loads(json.dumps(result, default=float))
    text = json.dumps(flat).lower()
    assert "mae" in text or "mse" in text, result
    def all_finite(x):
        if isinstance(x, dict):
            return all(all_finite(v) for v in x.values())
        if isinstance(x, (int, float)):
            return np.isfinite(x)
        return True
    assert all_finite(flat), result


def test_convert_baseline_logits_unit(rng):
    """D7: ReChorus inference scores -> canonical logit dict with
    default-item fallback (get_frameid2photoid_SegMM.py:16-61)."""
    from segmminterest_tpu.tasks.convert_baseline_logits import \
        predictions_csv_to_logits
    frame_map = {"77": [2, 3, 4], "88": [5, 6]}
    default_item = 99
    inter_df = pd.DataFrame({
        "user_id": [10, 11], "video_id": [77, 88],
        "time_ms": [1000, 2000]})
    user2dense = {10: 1, 11: 2}
    rows = []
    for f, s in zip([2, 3, 4, 99], [0.1, 0.2, 0.3, 0.05]):
        rows.append((1, 1000, f, s))     # user 10 scored frames + default
    rows.append((2, 2000, 99, 0.5))      # user 11: only the default item
    pred_df = pd.DataFrame(rows, columns=["user_id", "time", "item_id",
                                          "predictions"])
    logits = predictions_csv_to_logits(pred_df, frame_map, inter_df,
                                       user2dense, default_item)
    assert set(logits) == {"10-77-1000", "11-88-2000"}
    row = logits["10-77-1000"]
    assert len(row) == 40
    assert row[:3] == [0.1, 0.2, 0.3]
    assert all(x == 0.05 for x in row[3:])      # default pad
    # user 11 has no frame scores: every slot falls back to their default
    assert all(x == 0.5 for x in logits["11-88-2000"])


def test_dump_logits_pth_twin(tmp_path):
    """PARITY S11: --pth 1 writes a torch-pickle twin of the JSON dict
    (reference save_logits_for_all_leave_SegMM.py:195-200)."""
    import json
    import torch
    from segmminterest_tpu.utils.io import dump_logits

    d = {"10-77-1000": [0.1] * 40, "11-88-2000": [0.5] * 40}
    path = str(tmp_path / "interest_logits.json")
    dump_logits(d, path, pth=True)
    with open(path) as f:
        assert json.load(f) == d
    assert torch.load(str(tmp_path / "interest_logits.pth")) == d


@pytest.mark.slow
def test_exp_multi_seed_sweep(tmp_path, segrec_data):
    """C2: the sweep harness runs an entry across seeds and writes the
    per-seed + mean csv (SegRec/exp.py:84-126)."""
    from segmminterest_tpu.tasks.exp import main
    out = str(tmp_path / "exp.csv")
    rows = main(["--entry", "segrec", "--seeds", "0,1", "--out", out, "--",
                 "--model_name", "FM", "--model_mode", "CTR",
                 "--path", segrec_data, "--dataset", "SegMM_CTR",
                 "--epoch", "1", "--early_stop", "0"])
    assert len(rows) == 2
    df = pd.read_csv(out)
    assert list(df["seed"].astype(str)) == ["0", "1", "mean"]
    auc_cols = [c for c in df.columns if "auc" in c.lower()]
    assert auc_cols, df.columns
    col = df[auc_cols[0]].astype(float)
    np.testing.assert_allclose(col.iloc[2], col.iloc[:2].mean())


def test_serving_preset_pins_measured_config():
    """VERDICT r4 #7: --serving pins the measured deployment configuration
    (docs/DEPLOYMENT.md) and picks batch size from the latency table."""
    from segmminterest_tpu.tasks.export_logits import (
        SERVING_LATENCY_TABLE, apply_serving_preset)
    from segmminterest_tpu.utils.config import InterestConfig
    cfg = apply_serving_preset(InterestConfig())
    assert cfg.table_quant == "int8"
    assert cfg.fuse_qkv and not cfg.remat
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.test_batch_size == SERVING_LATENCY_TABLE[0][0]  # 1024
    # latency-targeted: largest measured batch meeting the target
    # (B=256 at 23.9 ms dominates B=128 at 21.8 ms for a 25 ms budget —
    # 10,728 vs 5,879 ips, the r5 frontier measurement)
    assert apply_serving_preset(InterestConfig(),
                                latency_target_ms=25.0).test_batch_size == 256
    assert apply_serving_preset(InterestConfig(),
                                latency_target_ms=50.0).test_batch_size == 512
    assert apply_serving_preset(InterestConfig(),
                                latency_target_ms=90.0).test_batch_size == 1024
    # unreachable target: fall back to the fastest measured point
    assert apply_serving_preset(InterestConfig(),
                                latency_target_ms=5.0).test_batch_size == 128


@pytest.mark.slow
def test_export_logits_serving_end_to_end(tmp_path):
    """A3 + the serving preset: train a tiny checkpoint, export logits via
    the --serving path (int8-quantized table on the eval engine), and check
    the reference key schema (save_logits_for_all_leave_SegMM.py:105-135)."""
    from segmminterest_tpu.data.reader import SeqReader
    from segmminterest_tpu.engine.train import run_training
    from segmminterest_tpu.tasks.export_logits import main as export_main
    from segmminterest_tpu.utils.config import InterestConfig

    reader = SeqReader.from_single_csv(SAMPLE, min_interactions=30,
                                       num_warmup=10)
    cfg = InterestConfig(
        sample_csv=SAMPLE, d_model=32, nhead=4, num_layers_enc=2,
        user_input_type="id", photo_input_type="id", fusion_heads=2,
        train_batch_size=128, valid_batch_size=128, test_batch_size=128,
        epochs=1, valid_step=2, logging_step=100, early_stop=0,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        ckpt_dir=str(tmp_path / "ckpt"), debug=True)
    result = run_training(cfg, reader)
    out = export_main([
        "--work_dir", result["work_dir"],
        "--sample_csv", SAMPLE, "--min_interactions", "30",
        "--num_warmup", "10",
        "--user_input_type", "id", "--photo_input_type", "id",
        "--d_model", "32", "--nhead", "4", "--num_layers_enc", "2",
        "--serving", "1", "--latency_target_ms", "25",
        "--splits", "test", "--out_dir", str(tmp_path / "logits")])
    d = json.load(open(out))
    assert len(d) == len(reader.tables["test"])
    key, row = next(iter(d.items()))
    assert len(key.split("-")) == 3 and len(row) == 40
    assert all(np.isfinite(row))
