"""SegRec framework tests: every registry model initializes and produces
finite (B, I) scores; losses and metrics match oracles; tiny end-to-end runs
for CTR and ranking on data built from the published sample csv."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.segrec.models import MODEL_REGISTRY
from segmminterest_tpu.segrec.runner import (RunnerConfig, bpr_loss,
                                             evaluate_ctr, evaluate_ranking,
                                             evaluate_wuauc)

N_USERS, N_ITEMS = 30, 80
FEATURE_MAX = {"user_id": N_USERS, "item_id": N_ITEMS, "i_duration": 45}
FEATURES = ["i_duration", "user_id", "item_id"]


def synthetic_feed(rng, B=4, I=3, L=6, with_frames=False, n_lines=50):
    dur = rng.integers(1, 41, size=(B, I)).astype(np.float64)
    feed = {
        "user_id": rng.integers(1, N_USERS, size=B),
        "item_id": rng.integers(1, N_ITEMS, size=(B, I)),
        "i_duration": dur,
        "label": rng.integers(0, 2, size=B).astype(np.float32),
        "row_mask": np.ones(B, bool),
        "history_item_id": rng.integers(1, N_ITEMS, size=(B, L)),
        "history_i_duration": rng.integers(1, 41, size=(B, L)).astype(
            np.float64),
        "lengths": rng.integers(1, L + 1, size=B),
        "c_interest_weight": rng.normal(size=(B, I, 40)).astype(np.float32),
    }
    if with_frames:
        feed["item_frame_lines"] = rng.integers(
            -1, n_lines, size=(B, I, 40)).astype(np.int32)
    return feed


def build_model(name, cls, use_frames):
    kwargs = {}
    common = dict(feature_max=FEATURE_MAX, dropout=0.1)
    if name in ("FM", "WideDeep", "DeepFM", "DCN", "DCNv2", "AutoInt",
                "FinalMLP", "AdaGIN"):
        return cls(FEATURES, FEATURE_MAX, emb_size=8, dropout=0.1)
    if name == "AFM":
        return cls(FEATURES, FEATURE_MAX, emb_size=8, attention_size=8,
                   dropout=0.1)
    if name == "xDeepFM":
        return cls(FEATURES, FEATURE_MAX, emb_size=8, cin_layers=(4, 4),
                   dropout=0.1)
    if name == "SAM":
        return cls(FEATURES, FEATURE_MAX, emb_size=8, dropout=0.1)
    if name in ("DIN", "DIEN", "CAN", "SDIM", "ETA"):
        return cls(user_features=["user_id"],
                   item_features=["item_id", "i_duration"],
                   situation_features=[], feature_max=FEATURE_MAX,
                   emb_size=8, dropout=0.1)
    if name in ("ClipRec", "ClipWDRec"):
        return cls(emb_dim=8, use_frames=use_frames, **common)
    if name == "ClipDINRec":
        return cls(emb_size=8, has_duration=True, use_frames=use_frames,
                   **common)
    return cls(emb_size=8, use_frames=use_frames, **common)


# general/sequential baselines have their own fixtures in
# test_baseline_models.py
CONTEXT_MODELS = sorted(set(MODEL_REGISTRY) - {
    "BPRMF", "NeuMF", "LightGCN", "DirectAU", "POP", "BUIR",
    "SASRec", "GRU4Rec", "Caser", "NARM", "FPMC", "TiSASRec", "ComiRec",
    "ContraRec", "TiMiRec", "SRGNN", "CLRec", "FourierTA", "S3Rec"})


@pytest.mark.parametrize("name", CONTEXT_MODELS)
def test_model_forward_shapes(rng, name):
    cls = MODEL_REGISTRY[name]
    use_frames = False
    model = build_model(name, cls, use_frames)
    feed = synthetic_feed(rng)
    feed = {k: jnp.asarray(v) for k, v in feed.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    variables = model.init(rngs, feed, deterministic=True)
    out = model.apply(variables, feed, deterministic=True,
                      rngs={"gumbel": jax.random.PRNGKey(3)})
    assert out.shape == (4, 3), name
    assert np.isfinite(np.asarray(out)).all(), name


def test_clip_model_with_frame_table(rng):
    model = build_model("ClipWDRec", MODEL_REGISTRY["ClipWDRec"], True)
    feed = synthetic_feed(rng, with_frames=True)
    feed = {k: jnp.asarray(v) for k, v in feed.items()}
    table = jnp.asarray(rng.normal(size=(50, 1024)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feed,
                           feat_table=table, deterministic=True)
    out = model.apply(variables, feed, feat_table=table, deterministic=True)
    assert out.shape == (4, 3)


def test_bpr_loss_matches_torch_reference(rng):
    import torch
    pred = rng.normal(size=(8, 5))
    got = float(bpr_loss(jnp.asarray(pred), jnp.ones(8, bool)))
    t = torch.tensor(pred)
    pos_pred, neg_pred = t[:, 0], t[:, 1:]
    neg_softmax = (neg_pred - neg_pred.max()).softmax(dim=1)
    want = -(((pos_pred[:, None] - neg_pred).sigmoid() * neg_softmax)
             .sum(dim=1)).clamp(min=1e-8, max=1 - 1e-8).log().mean()
    np.testing.assert_allclose(got, float(want), rtol=1e-6)


def test_evaluate_ranking_matches_reference(rng):
    pred = rng.normal(size=(64, 20))
    got = evaluate_ranking(pred, [5, 10], ["HR", "NDCG"])
    gt_rank = (pred > pred[:, 0].reshape(-1, 1)).sum(-1) + 1
    for k in (5, 10):
        hit = gt_rank <= k
        np.testing.assert_allclose(got[f"HR@{k}"], hit.mean(), rtol=1e-9)
        np.testing.assert_allclose(got[f"NDCG@{k}"],
                                   (hit / np.log2(gt_rank + 1)).mean(),
                                   rtol=1e-9)


def test_evaluate_ctr_matches_sklearn(rng):
    from sklearn.metrics import f1_score, log_loss, roc_auc_score
    preds = rng.random(300)
    labels = (rng.random(300) < 0.4).astype(float)
    got = evaluate_ctr(preds, labels, ["AUC", "F1_SCORE", "LOG_LOSS", "ACC"])
    np.testing.assert_allclose(got["AUC"], roc_auc_score(labels, preds),
                               rtol=1e-9)
    np.testing.assert_allclose(got["F1_SCORE"],
                               f1_score(labels, (preds > 0.5).astype(int)),
                               rtol=1e-9)
    clip = np.clip(preds, 1e-7, 1 - 1e-7)
    want_ll = -(np.log(clip) * labels + np.log(1 - clip) * (1 - labels)).mean()
    np.testing.assert_allclose(got["LOG_LOSS"], want_ll, rtol=1e-9)


def test_wuauc(rng):
    preds = rng.random(200)
    labels = (rng.random(200) < 0.5).astype(float)
    users = rng.integers(0, 5, size=200)
    w = evaluate_wuauc(preds, labels, users)
    assert 0 <= w <= 1


def test_ctr_end_to_end(segrec_data):
    from segmminterest_tpu.segrec.main import main as segrec_main
    result = segrec_main(["--model_name", "WideDeep", "--model_mode", "CTR",
                          "--path", segrec_data, "--dataset", "SegMM_CTR",
                          "--epoch", "1", "--batch_size", "256",
                          "--emb_size", "16"])
    assert 0.4 < result["test"]["AUC"] <= 1.0
    assert "WUAUC" in result["test"]


def test_ranking_end_to_end(segrec_data):
    from segmminterest_tpu.segrec.main import main as segrec_main
    result = segrec_main(["--model_name", "WideDeep", "--model_mode",
                          "Ranking", "--path", segrec_data, "--dataset",
                          "SegMM", "--epoch", "1", "--batch_size", "256",
                          "--emb_size", "16", "--topk", "3,5"])
    assert 0.0 <= result["test"]["HR@3"] <= 1.0


@pytest.mark.slow
def test_tisasrec_ranking_end_to_end(segrec_data):
    """Exercises the time-interval feed fields (history_times,
    user_min_intervals) end-to-end through the ranking runner."""
    from segmminterest_tpu.segrec.main import main as segrec_main
    result = segrec_main(["--model_name", "TiSASRec", "--model_mode",
                          "Ranking", "--path", segrec_data, "--dataset",
                          "SegMM", "--epoch", "1", "--batch_size", "256",
                          "--emb_size", "16", "--time_max", "32",
                          "--topk", "3,5"])
    assert 0.0 <= result["test"]["HR@3"] <= 1.0


@pytest.mark.slow
def test_xdeepfm_ctr_end_to_end(segrec_data):
    from segmminterest_tpu.segrec.main import main as segrec_main
    result = segrec_main(["--model_name", "xDeepFM", "--model_mode", "CTR",
                          "--path", segrec_data, "--dataset", "SegMM_CTR",
                          "--epoch", "1", "--batch_size", "256",
                          "--emb_size", "16", "--cin_layers", "[4,4]"])
    assert 0.4 < result["test"]["AUC"] <= 1.0


@pytest.mark.parametrize("kind", ["ContrastiveLoss", "infoNCELoss"])
def test_cliprec_contrastive_matches_torch(rng, kind):
    """ClipRec aux alignment losses vs fp64 torch transliterations of
    ClipRec.py:238-271; sown into the 'losses' collection and weighted by
    the runner (BaseRunner.py:210-214)."""
    import torch
    import torch.nn.functional as F
    model = build_model("ClipWDRec", MODEL_REGISTRY["ClipWDRec"], True)
    model = model.clone(contrastive=kind)
    feed = synthetic_feed(rng, with_frames=True)
    feed = {k: jnp.asarray(v) for k, v in feed.items()}
    table = jnp.asarray(rng.normal(size=(50, 1024)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feed,
                           feat_table=table, deterministic=True)
    variables = {"params": variables["params"]}
    out, mutated = model.apply(variables, feed, feat_table=table,
                               deterministic=True, mutable=["losses"])
    (aux,) = jax.tree_util.tree_leaves(mutated["losses"])

    # torch oracle over the raw streams, recomputed from params directly
    p = variables["params"]
    lines = np.asarray(feed["item_frame_lines"])
    frames = np.asarray(table)[np.clip(lines, 0, None)]
    frames = frames * (lines >= 0)[..., None]
    d = model.emb_dim
    B, I, C = lines.shape

    def np_dense(name, x):
        k = np.asarray(p[name]["kernel"], np.float64)
        b = np.asarray(p[name]["bias"], np.float64)
        return x @ k + b

    feats_embed = np.maximum(np_dense("frame_embedding",
                                      frames.astype(np.float64)), 0)
    feats_value = np.maximum(np_dense("frame_linear",
                                      frames.astype(np.float64)), 0)
    item_ids = np.asarray(feed["item_id"], np.int64)
    item_emb = np.asarray(p["item_embedding"]["embedding"],
                          np.float64)[item_ids]
    item_emb = np.repeat(item_emb[:, :, None, :], C, axis=2)
    pos = np.broadcast_to(np.arange(C, dtype=np.float64)[None, None, :, None],
                          (B, I, C, 1))
    pos_emb = np_dense("frame_position_embedding", pos)
    id_embed = np_dense("frame_id_projector",
                        np.concatenate([item_emb, pos_emb], -1))
    item_val = np.asarray(p["item_linear"]["embedding"],
                          np.float64)[item_ids]
    item_val = np.repeat(item_val[:, :, None, :], C, axis=2)
    pos_val = np_dense("frame_position_linear", pos)
    id_value = np_dense("frame_id_projector_linear",
                        np.concatenate([item_val, pos_val], -1))

    if kind == "ContrastiveLoss":
        e1 = torch.tensor(feats_embed.reshape(-1, d))
        e2 = torch.tensor(id_embed.reshape(-1, d))
        dist = (e1 - e2).pow(2).sum(1)
        want = (0.5 * dist).mean().item()
    else:
        e = torch.tensor(np.concatenate(
            [feats_embed.reshape(B * I, C * d),
             feats_value.reshape(B * I, C)], 1))
        g = torch.tensor(np.concatenate(
            [id_embed.reshape(B * I, C * d),
             id_value.reshape(B * I, C)], 1))
        e = F.normalize(e, dim=-1)
        g = F.normalize(g, dim=-1)
        dots = torch.mm(e, g.T) / 0.1
        mask = torch.eye(e.shape[0], dtype=torch.float64)
        pos_s = (torch.exp(dots) * mask).sum(1)
        neg_s = (torch.exp(dots) * (1 - mask)).sum(1)
        want = (-torch.log(pos_s / (pos_s + neg_s))).mean().item()
    np.testing.assert_allclose(float(aux), want, rtol=2e-4)

    # without the flag, nothing is sown
    plain = build_model("ClipWDRec", MODEL_REGISTRY["ClipWDRec"], True)
    _, mut2 = plain.apply(variables, feed, feat_table=table,
                          deterministic=True, mutable=["losses"])
    assert not mut2.get("losses")


def test_test_all_full_sort(segrec_data):
    """--test_all: candidates = [target] + all items, clicked masked -inf
    (BaseModel.py:231-235, BaseRunner.py:254-261)."""
    import numpy as np
    from segmminterest_tpu.segrec.corpus import Corpus
    from segmminterest_tpu.segrec.feeds import FeedBuilder
    from segmminterest_tpu.segrec.runner import RankingRunner, RunnerConfig
    corpus = Corpus(segrec_data, "SegMM")
    b = FeedBuilder(corpus, "test", task="ranking", test_all=True)
    model = MODEL_REGISTRY["BPRMF"](user_num=corpus.n_users,
                                    item_num=corpus.n_items, emb_size=8)
    r = RankingRunner(model, RunnerConfig(eval_batch_size=64))
    state = r.init_state(next(b.batches(64, shuffle=False)))
    preds = r.predict(b, state)
    assert preds.shape == (len(b), corpus.n_items)
    # each user's clicked items (train + residual) are -inf; the target's
    # first-column score stays finite
    u0 = b.user_id[0]
    clicked = (corpus.train_clicked_set.get(u0, set())
               | corpus.residual_clicked_set.get(u0, set()))
    assert clicked and all(np.isneginf(preds[0, list(clicked)]))
    assert np.isfinite(preds[0, 0])
    res = r.evaluate(b, state)
    assert 0 <= res["HR@5"] <= 1


def test_clip_weights_freedom_keys_and_neg_table(tmp_path):
    """FREEDOM logit files use 2-part {uid}-{iid} keys (CTR feed variant,
    BaseModel.py:376-412); eval_neg_weight supplies per-negative slices and
    raises on a miss (BaseModel.py:129-145)."""
    import json
    import numpy as np
    from segmminterest_tpu.segrec.feeds import ClipWeights
    fp = tmp_path / "FREEDOM_logits.json"
    json.dump({"7-99": [0.5] * 40}, open(fp, "w"))
    np_ = tmp_path / "neg.json"
    json.dump({"7-99": [0.25] * 40}, open(np_, "w"))
    cw = ClipWeights(str(fp), neg_weight_path=str(np_))
    assert cw.freedom_keys
    np.testing.assert_allclose(cw.target_slice(7, 99, 12345),
                               np.full(40, 0.5))
    # missing key falls back to ones for targets...
    np.testing.assert_allclose(cw.target_slice(8, 99, 1), np.ones(40))
    np.testing.assert_allclose(cw.neg_slice(7, 99, 1), np.full(40, 0.25))
    # ...but raises for negatives (reference KeyError path)
    with pytest.raises(KeyError):
        cw.neg_slice(8, 99, 1)
    # non-FREEDOM path uses 3-part keys with the dense->raw maps
    fp2 = tmp_path / "interest_logits.json"
    json.dump({"70-990-5": [0.1] * 40}, open(fp2, "w"))
    cw2 = ClipWeights(str(fp2), id2user={"7": "70"}, id2item={"99": "990"})
    np.testing.assert_allclose(cw2.target_slice(7, 99, 5), np.full(40, 0.1))


@pytest.mark.slow
def test_s3rec_two_stage_end_to_end(segrec_data, tmp_path):
    """S3Rec's two-stage protocol (developing/S3Rec.py docstring: pretrain
    with --s3rec_stage 1 saving via --model_path, then finetune with
    --load 1 absorbing the pretrained encoder via partial restore)."""
    from segmminterest_tpu.segrec.main import main as segrec_main
    ckpt = str(tmp_path / "s3rec_pre.msgpack")
    pre = segrec_main(["--model_name", "S3Rec", "--model_mode", "Ranking",
                       "--path", segrec_data, "--dataset", "SegMM",
                       "--epoch", "1", "--batch_size", "128",
                       "--emb_size", "16", "--history_max", "8",
                       "--s3rec_stage", "1", "--model_path", ckpt,
                       "--topk", "3,5"])
    import os
    assert os.path.exists(ckpt)
    fin = segrec_main(["--model_name", "S3Rec", "--model_mode", "Ranking",
                       "--path", segrec_data, "--dataset", "SegMM",
                       "--epoch", "1", "--batch_size", "128",
                       "--emb_size", "16", "--history_max", "8",
                       "--s3rec_stage", "2", "--model_path", ckpt,
                       "--load", "1", "--topk", "3,5"])
    assert 0.0 <= fin["test"]["HR@3"] <= 1.0
