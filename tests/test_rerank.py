"""Impression/reranking stack: reader grouping, listwise metrics vs the
reference's own code, reranker forwards, frozen-ranker gradients, and the
pretrained-ranker hand-off."""

import ast
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from segmminterest_tpu.segrec.rerank import (
    IMPRESSION_RANKERS, RERANKERS, ImpressionFeedBuilder,
    build_impressions, evaluate_impressions, impression_targets,
    make_impression_runner)
from segmminterest_tpu.segrec.runner import RunnerConfig

REF = "/root/reference/SkipPredBaseline/ReChorus/src/helpers/ImpressionRunner.py"

N_USERS, N_ITEMS = 10, 60


class FakeCorpus:
    def __init__(self, rows):
        df = pd.DataFrame(rows, columns=["user_id", "item_id", "time",
                                         "label"])
        self.data_df = {"train": df, "dev": df.iloc[:0], "test": df.iloc[:0]}
        self.n_users, self.n_items = N_USERS, N_ITEMS


def test_build_impressions_grouping():
    """(user, time) grouping with pos/neg split; groups lacking either side
    are dropped (ImpressionReader.py:74-97,121)."""
    rows = [
        (1, 10, 100, 1), (1, 11, 100, 0), (1, 12, 100, 0),  # kept
        (1, 13, 200, 1), (1, 14, 200, 1),                   # no neg: drop
        (2, 15, 100, 0),                                    # no pos: drop
        (2, 16, 300, 1), (2, 17, 300, 0),                   # kept
        (2, 16, 300, 1),                                    # dup pos merged
    ]
    data = build_impressions(FakeCorpus(rows), "train", pos_len=3, neg_len=3)
    assert list(data["user_id"]) == [1, 2]
    assert list(data["pos_num"]) == [1, 1]
    assert list(data["neg_num"]) == [2, 1]
    np.testing.assert_array_equal(data["item_id"][0], [10, 0, 0, 11, 12, 0])
    np.testing.assert_array_equal(data["item_id"][1], [16, 0, 0, 17, 0, 0])


def test_build_impressions_history_strictly_earlier():
    """history = positive stream with time < impression time
    (BaseImpressionModel.py:237-253 slicing at the stored position)."""
    rows = [
        (1, 10, 100, 1), (1, 11, 100, 0),
        (1, 20, 200, 1), (1, 21, 200, 0),
        (1, 30, 300, 1), (1, 31, 300, 0),
    ]
    data = build_impressions(FakeCorpus(rows), "train", pos_len=2,
                             neg_len=2, history_max=4)
    # impression at t=300 sees positives from t=100,200 only
    i = list(data["time"]).index(300)
    assert data["lengths"][i] == 2
    np.testing.assert_array_equal(data["history_items"][i, :2], [10, 20])
    i0 = list(data["time"]).index(100)
    assert data["lengths"][i0] == 0
    # neg history = negative stream with time < impression time
    # (ImpressionSeqReader.user_his['neg'], ImpressionSeqReader.py:38-50)
    assert data["neg_lengths"][i] == 2
    np.testing.assert_array_equal(data["neg_history_items"][i, :2],
                                  [11, 21])
    np.testing.assert_array_equal(data["neg_history_times"][i, :2],
                                  [100, 200])
    assert data["neg_lengths"][i0] == 0


def test_impression_targets():
    t = impression_targets(np.array([2, 1]), np.array([1, 3]), 3, 3)
    np.testing.assert_array_equal(t[0], [1, 1, -1, 0, -1, -1])
    np.testing.assert_array_equal(t[1], [1, -1, -1, 0, 0, 0])


def test_feed_builder_wrap_pads(rng):
    rows = [(u, 10 + u * 3 + j, 100, int(j == 0))
            for u in range(1, 6) for j in range(3)]
    fb = ImpressionFeedBuilder(FakeCorpus(rows), "train", pos_len=2,
                               neg_len=2)
    batches = list(fb.batches(4))
    assert len(batches) == 2
    last = batches[1]
    assert last["row_mask"].tolist() == [True, False, False, False]
    # wrapped rows are REAL impressions (no all-pad rows for the losses)
    assert (last["pos_num"] > 0).all() and (last["neg_num"] > 0).all()


# ---------------------------------------------------------------------------
# metrics vs the reference's own evaluate_method (ImpressionRunner.py:74-133)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_evaluate_method():
    with open(REF, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    ns = {"np": np, "logging": logging, "Dict": dict, "List": list}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "HR_at_k", "DCG_at_k", "NDCG_at_k", "AP_at_k"):
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         REF, "exec"), ns)
        if isinstance(node, ast.ClassDef) and node.name == "ImpressionRunner":
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) \
                        and sub.name == "evaluate_method":
                    sub.decorator_list = []
                    sub.returns = None
                    for a in sub.args.args:
                        a.annotation = None
                    exec(compile(ast.Module(body=[sub], type_ignores=[]),
                                 REF, "exec"), ns)
    return ns["evaluate_method"]


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference checkout unavailable")
def test_metrics_match_reference(rng, ref_evaluate_method):
    # the reference builds its label matrix as [pos_len | pos_len]
    # (ImpressionRunner.py:108-109), so its own evaluate_method only works
    # when pos_len == neg_len (the shipped defaults are 20/20); the parity
    # check therefore uses a square layout
    R, P, N = 40, 5, 5
    pos_num = rng.integers(1, P + 1, size=R)
    neg_num = rng.integers(1, N + 1, size=R)
    preds = rng.normal(size=(R, P + N))
    # a few exact ties across the pos/neg boundary exercise the eps rule
    preds[:5, 0] = preds[:5, P]
    ar = np.arange(P + N)[None, :]
    valid = np.where(ar < P, ar < pos_num[:, None],
                     (ar - P) < neg_num[:, None])
    preds = np.where(valid, preds, -np.inf)

    ours = evaluate_impressions(preds, pos_num, neg_num, P, topk=(1, 3, 5),
                                metrics=("NDCG", "MAP", "HR"))
    ref = ref_evaluate_method(preds.copy(), [1, 3, 5], ["NDCG", "MAP", "HR"],
                              False, neg_num, P, list(pos_num), 0, 0, 0)
    for k, v in ref.items():
        np.testing.assert_allclose(ours[k], v, rtol=1e-12, err_msg=k)


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

def imp_feed(rng, B=4, P=3, N=4, L=5, with_history=True):
    pos_num = rng.integers(1, P + 1, size=B).astype(np.int32)
    neg_num = rng.integers(1, N + 1, size=B).astype(np.int32)
    feed = {
        "user_id": rng.integers(1, N_USERS, size=B).astype(np.int32),
        "item_id": rng.integers(1, N_ITEMS, size=(B, P + N)).astype(np.int32),
        "pos_num": pos_num, "neg_num": neg_num,
        "target": impression_targets(pos_num, neg_num, P, N),
        "row_mask": np.ones(B, bool),
    }
    if with_history:
        feed["history_items"] = rng.integers(
            1, N_ITEMS, size=(B, L)).astype(np.int32)
        feed["history_times"] = np.sort(
            rng.integers(1, 1000, size=(B, L))).astype(np.int64)
        feed["lengths"] = rng.integers(1, L + 1, size=B).astype(np.int32)
    return feed


def build_reranker(name, ranker_name="BPRMF", tuneranker=False,
                   setrank_type="IMSAB"):
    rk = {"user_num": N_USERS, "item_num": N_ITEMS, "emb_size": 8}
    if ranker_name == "SASRec":
        rk.update(num_heads=2, history_max=5)
    ranker = IMPRESSION_RANKERS[ranker_name](**rk)
    kw = dict(item_num=N_ITEMS, ranker=ranker, ranker_emb_size=8,
              pos_len=3, neg_len=4, emb_size=8, num_heads=2,
              num_hidden_unit=16, tuneranker=tuneranker)
    if name in ("PRM", "SetRank"):
        kw["n_blocks"] = 2
    if name == "SetRank":
        kw["setrank_type"] = setrank_type
    return RERANKERS[name](**kw)


@pytest.mark.parametrize("spec", [("PRM", "BPRMF"), ("SetRank", "BPRMF"),
                                  ("MIR", "BPRMF"), ("MIR", "SASRec"),
                                  ("PRM", "SASRec")])
def test_reranker_forward(rng, spec):
    name, ranker_name = spec
    model = build_reranker(name, ranker_name)
    feed = {k: jnp.asarray(v) for k, v in imp_feed(rng).items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           feed, deterministic=True)
    out = model.apply(variables, feed, deterministic=True)
    assert out.shape == (4, 7), name
    assert np.isfinite(np.asarray(out)).all(), name


def test_setrank_msab_variant(rng):
    model = build_reranker("SetRank", setrank_type="MSAB")
    feed = {k: jnp.asarray(v) for k, v in imp_feed(rng).items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, feed,
                           deterministic=True)
    out = model.apply(variables, feed, deterministic=True)
    assert out.shape == (4, 7) and np.isfinite(np.asarray(out)).all()


def test_frozen_ranker_gets_no_gradient(rng):
    """stop_gradient unless tuneranker (BaseRerankerModel.py:64-66)."""
    from segmminterest_tpu.segrec.impression import IMPRESSION_LOSSES
    feed = {k: jnp.asarray(v) for k, v in imp_feed(rng).items()}

    def grad_norm(tune):
        model = build_reranker("PRM", tuneranker=tune)
        variables = model.init({"params": jax.random.PRNGKey(0)}, feed,
                               deterministic=True)

        def loss_fn(params):
            out = model.apply({"params": params}, feed, deterministic=True)
            return IMPRESSION_LOSSES["BPRsession"](out, feed["target"], 3)
        g = jax.grad(loss_fn)(variables["params"])
        rg = g["ranker"]
        return float(sum(jnp.abs(x).sum()
                         for x in jax.tree.leaves(rg)))

    assert grad_norm(False) == 0.0
    assert grad_norm(True) > 0.0


def test_load_ranker_transplants_params(rng, tmp_path):
    """The pretrained ranker checkpoint lands in the nested 'ranker' scope
    (BaseRerankerModel.load_ranker :40-66)."""
    feed_r = {k: jnp.asarray(v) for k, v in imp_feed(rng).items()}
    ranker = IMPRESSION_RANKERS["BPRMF"](user_num=N_USERS, item_num=N_ITEMS,
                                         emb_size=8)
    cfg = RunnerConfig(epoch=1, batch_size=4, eval_batch_size=4,
                       topk=(1,), metrics=("NDCG",), loss_n="BPRsession")
    r_runner = make_impression_runner(ranker, cfg, 3, 4)
    r_state = r_runner.init_state(feed_r)
    path = str(tmp_path / "ranker.msgpack")
    r_runner.save_state(r_state, path)

    model = build_reranker("PRM")
    runner = make_impression_runner(model, cfg, 3, 4)
    state = runner.init_state(feed_r)
    state = runner.load_ranker(state, path)
    got = state["params"]["ranker"]
    want = r_state["params"]
    np.testing.assert_allclose(
        np.asarray(got["i_embeddings"]["embedding"]),
        np.asarray(want["i_embeddings"]["embedding"]), rtol=1e-6)


def test_impression_runner_end_to_end(rng):
    """One fit epoch + evaluate on a synthetic corpus through the runner."""
    rows = []
    for u in range(1, 8):
        for t in (100, 200):
            items = rng.integers(1, N_ITEMS, size=4)
            for j, it in enumerate(items):
                rows.append((u, int(it), t, int(j < 2)))
    corpus = FakeCorpus(rows)
    fb = ImpressionFeedBuilder(corpus, "train", pos_len=3, neg_len=3)
    ranker = IMPRESSION_RANKERS["BPRMF"](user_num=N_USERS, item_num=N_ITEMS,
                                         emb_size=8)
    cfg = RunnerConfig(epoch=1, batch_size=8, eval_batch_size=8,
                       topk=(1, 3), metrics=("NDCG", "MAP", "HR"),
                       loss_n="BPRsession")
    runner = make_impression_runner(ranker, cfg, 3, 3)
    state = runner.init_state(next(fb.batches(8)))
    state, loss = runner.fit(fb, state, 1)
    assert np.isfinite(loss)
    res = runner.evaluate(fb, state)
    assert 0.0 <= res["HR@3"] <= 1.0
    assert 0.0 <= res["NDCG@1"] <= 1.0
