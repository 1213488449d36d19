"""End-to-end smoke: reader -> batcher -> engine -> checkpoint -> test metrics
on the published sample csv (BASELINE.json config #1, CPU-runnable)."""

import os

import numpy as np
import pytest

from segmminterest_tpu.data.reader import SeqReader
from segmminterest_tpu.engine.train import run_training
from segmminterest_tpu.utils.config import InterestConfig

SAMPLE = "/root/reference/SegMM_inter_sample.csv"


@pytest.fixture(scope="module")
def sample_reader():
    # lower thresholds so the 10k-row sample yields all three splits
    return SeqReader.from_single_csv(SAMPLE, min_interactions=30,
                                     num_warmup=10)


def test_reader_builds_consistent_tables(sample_reader):
    r = sample_reader
    assert r.n_users > 0 and r.n_items > 0
    for split in ("train", "dev", "test"):
        t = r.tables[split]
        assert len(t) > 0
        assert t.labels.shape == (len(t), 40)
        assert set(np.unique(t.labels)) <= {1, 0, -1, -2}
        assert (t.user_idx > 0).all() and (t.item_idx > 0).all()
        assert t.user_idx.max() <= r.n_users
        assert t.item_idx.max() <= r.n_items
    # histories are consistent: position is within the user's sequence
    t = r.tables["train"]
    for i in range(0, len(t), max(1, len(t) // 37)):
        items, playing = r.history_slice(t.user_raw[i], t.position[i])
        assert len(items) == len(playing) <= r.history_max


def test_batch_iterator_shapes(sample_reader):
    from segmminterest_tpu.data.dataset import BatchIterator
    it = BatchIterator(sample_reader, sample_reader.tables["dev"], 64,
                       shuffle=False)
    batches = list(it)
    assert all(b["label"].shape == (64, 40) for b in batches)
    n_real = sum(int(b["row_mask"].sum()) for b in batches)
    assert n_real == len(sample_reader.tables["dev"])
    # padded rows are fully masked
    last = batches[-1]
    assert (last["label"][~last["row_mask"]] == -2).all()


@pytest.mark.slow
def test_training_end_to_end(tmp_path, sample_reader):
    cfg = InterestConfig(
        sample_csv=SAMPLE, d_model=32, nhead=4, num_layers_enc=2,
        user_input_type="id", photo_input_type="id", fusion_heads=2,
        train_batch_size=128, valid_batch_size=128, test_batch_size=128,
        # debug caps training at 4 steps; valid_step=2 fires validations at
        # steps 1 and 3 (the reference CLI forces valid_step=1 under --debug)
        epochs=1, valid_step=2, logging_step=100, early_stop=0,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        eval_type_list="JaccardSim,LeaveMSE,LeaveCTR,LeaveCTR_view,TOP_K",
        ckpt_dir=str(tmp_path), debug=True, eval_cold="test")
    result = run_training(cfg, sample_reader)
    assert result["steps"] > 0
    tm = result["test_metrics"]
    for key in ("HR@5", "NDCG@5", "JaccardSim", "LeaveMSE", "LeaveCTR"):
        assert key in tm and np.isfinite(tm[key]), key
    assert 0.0 <= tm["HR@5"] <= 1.0
    assert "cold_test_metrics" in result
    # checkpoints on disk: latest + one best
    files = os.listdir(result["work_dir"])
    assert any(f.startswith("ckpt-latest") for f in files)
    assert any(f.startswith("ckpt-best") for f in files)
    # validation metric history recorded
    assert len(result["valid_metrics"]["HR@5"]) >= 2


@pytest.mark.slow
def test_training_end_to_end_fuse_layer(tmp_path, sample_reader):
    """The layer-fused kernel path (fuse_layer=1) through the full engine:
    on CPU it exercises the composed fallback incl. train-mode dropout and
    the degenerate usr stream of the ID backbone."""
    cfg = InterestConfig(
        sample_csv=SAMPLE, d_model=32, nhead=4, num_layers_enc=2,
        user_input_type="id", photo_input_type="id", fusion_heads=2,
        train_batch_size=128, valid_batch_size=128, test_batch_size=128,
        epochs=1, valid_step=2, logging_step=100, early_stop=0,
        loss_type="interestBPR,focal", exposure_prob=[1.0] * 40,
        eval_type_list="TOP_K", ckpt_dir=str(tmp_path), debug=True,
        fuse_layer=True)
    result = run_training(cfg, sample_reader)
    assert result["steps"] > 0
    tm = result["test_metrics"]
    assert np.isfinite(tm["HR@5"]) and 0.0 <= tm["HR@5"] <= 1.0


@pytest.mark.slow
def test_kuairand_dialect_end_to_end(tmp_path, rng):
    """KuaiRand column dialect (photo_id / play_time_ms, no label_1D) flows
    through the same reader + training path (SURVEY.md A2/A9)."""
    import pandas as pd
    from segmminterest_tpu.data.reader import SeqReader
    from segmminterest_tpu.engine.train import run_training
    from segmminterest_tpu.utils.config import InterestConfig
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(1, 12, size=n),
        "photo_id": rng.integers(1, 300, size=n),
        "time_ms": rng.integers(1_000_000, 2_000_000, size=n),
        "duration_ms": rng.integers(5_000, 199_000, size=n),
        "play_time_ms": rng.integers(1, 150_000, size=n),
        "is_click": rng.integers(0, 2, size=n),
    })
    csv = str(tmp_path / "kuairand.csv")
    df.to_csv(csv, index=False)
    reader = SeqReader.from_single_csv(csv, min_interactions=50,
                                       num_warmup=5)
    assert len(reader.tables["train"]) > 0
    # labels were constructed from duration/playing (no label_1D column)
    labs = reader.tables["train"].labels
    assert set(np.unique(labs)) <= {1, 0, -1, -2}
    cfg = InterestConfig(
        d_model=32, nhead=4, num_layers_enc=2, user_input_type="id",
        photo_input_type="id", fusion_heads=2, train_batch_size=128,
        valid_batch_size=128, test_batch_size=128, epochs=1, valid_step=2,
        early_stop=0, loss_type="interestBPR", exposure_prob=[1.0] * 40,
        ckpt_dir=str(tmp_path / "ck"), debug=True)
    result = run_training(cfg, reader)
    assert np.isfinite(result["test_metrics"]["HR@5"])


@pytest.mark.slow
def test_introspection_flags_write_artifacts(tmp_path, sample_reader):
    """--record_train_detail / --count_view_completion / --plot_curves /
    --draw_case artifacts (main_…SegMM.py:241-254,314-327,462-470)."""
    cfg = InterestConfig(
        sample_csv=SAMPLE, d_model=32, nhead=4, num_layers_enc=2,
        user_input_type="id", photo_input_type="id", fusion_heads=2,
        train_batch_size=128, valid_batch_size=128, test_batch_size=128,
        epochs=1, valid_step=2, early_stop=0, loss_type="interestBPR",
        exposure_prob=[1.0] * 40, ckpt_dir=str(tmp_path), debug=True,
        record_train_detail=True, count_view_completion=True,
        plot_curves=True, draw_case=2)
    result = run_training(cfg, sample_reader)
    wd = result["work_dir"]
    files = set(os.listdir(wd))
    assert "record_logit_gt.npy" in files
    assert "valid_loss_metrics.json" in files
    assert "train_loss.png" in files and "valid_loss.png" in files
    assert "view_completion" in result
    figs = os.listdir(os.path.join(wd, "figure"))
    assert len(figs) == 2 and all(f.endswith(".png") for f in figs)


@pytest.mark.slow
def test_save_logits_artifact(tmp_path, sample_reader):
    """--save_logits dumps [interests | gt | uid | pid] rows at test
    (main_…SegMM.py:358-361)."""
    cfg = InterestConfig(
        sample_csv=SAMPLE, d_model=32, nhead=4, num_layers_enc=2,
        user_input_type="id", photo_input_type="id", fusion_heads=2,
        train_batch_size=128, valid_batch_size=128, test_batch_size=128,
        epochs=1, valid_step=2, early_stop=0, loss_type="interestBPR",
        exposure_prob=[1.0] * 40, ckpt_dir=str(tmp_path), debug=True,
        save_logits=True)
    result = run_training(cfg, sample_reader)
    arr = np.load(os.path.join(result["work_dir"], "save_logits_gt_eval.npy"))
    assert arr.shape[1] == 40 + 40 + 2   # interests | labels | uid | pid
    assert np.isfinite(arr[:, :40]).all()
    assert set(np.unique(arr[:, 40:80])) <= {1, 0, -1, -2}
    assert (arr[:, 80] > 0).all() and (arr[:, 81] > 0).all()


def test_prefetch_producer_stops_when_consumer_abandons():
    """The prefetch thread must terminate (not block forever on a full
    queue) when the consumer stops iterating early — debug breaks, early
    stop, and NaN aborts all abandon iterators mid-epoch."""
    import threading
    import time as _time

    from segmminterest_tpu.data.dataset import prefetch

    before = threading.active_count()
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    assert next(it) == 0
    assert next(it) == 1
    it.close()  # GeneratorExit -> finally -> stop event

    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    # the producer stopped early instead of draining all 1000 items
    assert len(produced) < 100


def test_prefetch_propagates_producer_exception():
    from segmminterest_tpu.data.dataset import prefetch

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass


def test_batch_iterator_epochs_and_transform(sample_reader):
    """epochs(n) streams n reshuffled epochs through one prefetch pipeline;
    transform= runs in the producer and its '_dev' attachment short-circuits
    put_batch while host fields stay numpy."""
    from segmminterest_tpu.data.dataset import BatchIterator

    calls = []

    def tf(batch):
        calls.append(1)
        out = dict(batch)
        out["_dev"] = {"row_mask": batch["row_mask"]}
        return out

    it = BatchIterator(sample_reader, sample_reader.tables["dev"], 64,
                       shuffle=True, seed=3, transform=tf)
    per_epoch = len(it)
    batches = list(it.epochs(2))
    assert len(batches) == 2 * per_epoch
    assert len(calls) == 2 * per_epoch
    n_rows = len(sample_reader.tables["dev"])
    total = sum(int(b["row_mask"].sum()) for b in batches)
    assert total == 2 * n_rows
    assert all("_dev" in b for b in batches)
    assert isinstance(batches[0]["label"], np.ndarray)
    # epoch 2 is a different shuffle than epoch 1
    ids0 = np.concatenate([b["photo_identity_id"] for b in
                           batches[:per_epoch]])
    ids1 = np.concatenate([b["photo_identity_id"] for b in
                           batches[per_epoch:]])
    assert not np.array_equal(ids0, ids1)
    assert sorted(ids0.tolist()) == sorted(ids1.tolist())


def test_user_pool_streams_match_direct_derivation(sample_reader):
    """The per-user-stream pool layout (round 4, PARITY D7 closed) must
    reproduce the direct per-row pool derivation exactly: history-window
    played lines then warm-up lines (dataloader_SegMM.py:319-341), and the
    per-batch draw must emit exactly that pool (small rows) or a user_max
    subset of it (large rows)."""
    import bench
    from segmminterest_tpu.data.dataset import BatchIterator

    rng = np.random.default_rng(5)
    store = bench.synthetic_store(sample_reader, rng, n_lines=4096)
    t = sample_reader.tables["train"]
    it = BatchIterator(sample_reader, t, 64, shuffle=False,
                       feature_store=store, seed=11, prefetch_size=0)
    # exact pool content, every row
    for r in range(len(t)):
        expect = it._user_lines_pool(int(t.user_raw[r]), int(t.position[r]))
        got = it.row_pool(r)
        np.testing.assert_array_equal(got, expect)
    # draw semantics per batch row
    saw_large = saw_small = False
    for start in range(0, min(len(t), 256), 64):
        idx = np.arange(start, min(start + 64, len(t)))
        batch = it._assemble(idx)
        for bi, ri in enumerate(idx):
            pool = it.row_pool(int(ri))
            m = int(batch["user_mask"][bi].sum())
            lines = batch["user_lines"][bi, :m]
            assert (batch["user_lines"][bi, m:] == -1).all()
            if len(pool) > it.user_max:
                saw_large = True
                assert m == it.user_max
                # multiset inclusion: every drawn line exists in the pool
                # with at least the drawn multiplicity
                pv, pc = np.unique(pool, return_counts=True)
                lv, lc = np.unique(lines, return_counts=True)
                pos = np.searchsorted(pv, lv)
                assert (pv[pos] == lv).all()
                assert (lc <= pc[pos]).all()
            else:
                saw_small = True
                np.testing.assert_array_equal(lines, pool)
    assert saw_small  # the sample data must exercise both branches
    assert saw_large
