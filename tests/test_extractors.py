"""Extraction pipeline tests: tiny random-init CLIP/Whisper towers, the
crash-safe cache, memmap assembly, and an end-to-end feature-mode training
run on the assembled store."""

import os

import numpy as np
import pytest

from segmminterest_tpu.extractors import (AudioExtractor, ExtractionCache,
                                          VisualExtractor, assemble_memmap)
from segmminterest_tpu.extractors.visual import shard_work

TINY_CLIP = dict(hidden_size=64, intermediate_size=128,
                 num_attention_heads=4, num_hidden_layers=2,
                 image_size=32, patch_size=16)
TINY_WHISPER = dict(d_model=64, encoder_layers=2, decoder_layers=2,
                    encoder_attention_heads=4, decoder_attention_heads=4,
                    encoder_ffn_dim=128, decoder_ffn_dim=128,
                    num_mel_bins=80, max_source_positions=1500)


def test_visual_extractor_shapes(rng):
    ex = VisualExtractor(random_init=True, config_overrides=TINY_CLIP,
                         inner_batch=4)
    frames = (rng.random((7, 48, 48, 3)) * 255).astype(np.uint8)
    feats = ex.extract_frames(frames)
    assert feats.shape == (7, 64)
    assert np.isfinite(feats).all()
    # deterministic across calls (jitted, no dropout at inference)
    feats2 = ex.extract_frames(frames)
    np.testing.assert_allclose(feats, feats2, rtol=1e-6)


def test_audio_extractor_shapes(rng):
    ex = AudioExtractor(random_init=True, config_overrides=TINY_WHISPER,
                        inner_batch=2)
    waveform = rng.normal(size=16000 * 12).astype(np.float32)  # 12 s -> 3 seg
    feats = ex.extract_waveform(waveform)
    assert feats.shape == (3, 64)
    assert np.isfinite(feats).all()


def test_cache_crash_safety(tmp_path, rng):
    cache = ExtractionCache(str(tmp_path / "c"))
    cache.save("123", rng.normal(size=(5, 16)).astype(np.float32))
    assert cache.key_exists("123")
    # torn write: data without flag is not "done"
    np.save(str(tmp_path / "c" / "999.npy"), np.zeros((2, 16), np.float32))
    assert not cache.key_exists("999")
    assert list(cache.keys()) == ["123"]


def test_assemble_memmap_matches_training_format(tmp_path, rng):
    cache = ExtractionCache(str(tmp_path / "c"))
    arrs = {}
    for pid in (11, 7, 42):
        arrs[pid] = rng.normal(size=(rng.integers(1, 6), 16)).astype(
            np.float32)
        cache.save(str(pid), arrs[pid])
    mm_path = str(tmp_path / "feat.dat")
    map_path = str(tmp_path / "map.json")
    total = assemble_memmap(cache, mm_path, map_path, feat_dim=16)
    assert total == sum(a.shape[0] for a in arrs.values())
    # load through the training-side FeatureStore
    from segmminterest_tpu.data.feature_store import FeatureStore
    import json
    with open(map_path) as f:
        lineid_map = json.load(f)
    feat = np.memmap(mm_path, dtype="float32", mode="r", shape=(total, 16))
    store = FeatureStore(feat, lineid_map)
    for pid, arr in arrs.items():
        lines = store.photo_line_ids(pid, arr.shape[0])
        np.testing.assert_allclose(store.gather(lines), arr, rtol=1e-6)


def test_shard_work_covers_all_items():
    items = list(range(103))
    groups = [shard_work(items, g, 8) for g in range(8)]
    flat = [x for g in groups for x in g]
    assert sorted(flat) == items


@pytest.mark.slow
def test_feature_mode_training_on_assembled_store(tmp_path, rng):
    """Full loop closure: extract (random tower) -> assemble -> train the
    dual-backbone 'both' model on the real feature store."""
    import pandas as pd
    sample = pd.read_csv("/root/reference/SegMM_inter_sample.csv", nrows=4000)
    cache = ExtractionCache(str(tmp_path / "c"))
    from segmminterest_tpu.data.labels import frame_count
    for pid, dur in sample.drop_duplicates("video_id")[
            ["video_id", "duration_ms"]].itertuples(index=False):
        n = min(frame_count(dur), 40)
        cache.save(str(int(pid)),
                   rng.normal(size=(n, 32)).astype(np.float32))
    mm_path = str(tmp_path / "feat.dat")
    map_path = str(tmp_path / "map.json")
    total = assemble_memmap(cache, mm_path, map_path, feat_dim=32)

    csv_path = str(tmp_path / "inter.csv")
    sample.to_csv(csv_path, index=False)
    from segmminterest_tpu.data.feature_store import FeatureStore
    from segmminterest_tpu.data.reader import SeqReader
    from segmminterest_tpu.engine.train import run_training
    from segmminterest_tpu.utils.config import InterestConfig
    reader = SeqReader.from_single_csv(csv_path, min_interactions=20,
                                       num_warmup=5)
    store = FeatureStore.open(mm_path, map_path, feat_dim=32)
    cfg = InterestConfig(
        d_model=32, nhead=4, num_layers_enc=2, user_input_type="both",
        photo_input_type="both", fusion_heads=2, train_batch_size=64,
        valid_batch_size=64, test_batch_size=64, epochs=1, valid_step=2,
        early_stop=0, loss_type="interestBPR", exposure_prob=[1.0] * 40,
        ckpt_dir=str(tmp_path / "ckpt"), debug=True)
    result = run_training(cfg, reader, feature_store=store)
    assert np.isfinite(result["test_metrics"]["HR@5"])
