"""General/sequential ReChorus baselines + the MMRec family: forward shapes,
loss sanity, and tiny end-to-end runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.segrec.models import MODEL_REGISTRY
from segmminterest_tpu.segrec.models.general import DirectAUModel

N_USERS, N_ITEMS = 30, 80


def seq_feed(rng, B=4, I=3, L=6):
    return {
        "user_id": rng.integers(1, N_USERS, size=B),
        "item_id": rng.integers(1, N_ITEMS, size=(B, I)),
        "row_mask": np.ones(B, bool),
        "history_item_id": rng.integers(1, N_ITEMS, size=(B, L)),
        "history_times": np.sort(rng.integers(0, 10_000, size=(B, L))),
        "user_min_intervals": rng.integers(1, 50, size=B),
        "lengths": rng.integers(1, L + 1, size=B),
        "history_delta_t": rng.integers(0, 10_000, size=(B, L)),
        "srgnn_alias": rng.integers(0, L, size=(B, L)),
        "srgnn_items": rng.integers(0, N_ITEMS, size=(B, L)),
        "srgnn_A": rng.random((B, L, 2 * L)).astype(np.float32),
    }


def build(name, rng):
    cls = MODEL_REGISTRY[name.split("-")[0]]
    if name in ("BPRMF", "DirectAU", "NeuMF", "BUIR"):
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8)
    if name == "LightGCN":
        return cls(user_num=N_USERS, item_num=N_ITEMS,
                   edge_users=rng.integers(1, N_USERS, 50).astype(np.int32),
                   edge_items=rng.integers(1, N_ITEMS, 50).astype(np.int32),
                   emb_size=8)
    if name == "POP":
        return cls(popularity=rng.random(N_ITEMS).astype(np.float32))
    if name == "SASRec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_heads=2, history_max=6)
    if name == "GRU4Rec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   hidden_size=12)
    if name == "Caser":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_horizon=4, num_vertical=2, L=3, history_max=6)
    if name in ("NARM", "FPMC"):
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8)
    if name == "TiSASRec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_heads=2, history_max=6, time_max=16)
    if name == "ComiRec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   attn_size=4, K=2, history_max=6)
    if name == "ContraRec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_heads=2, history_max=6)
    if name == "SRGNN":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8)
    if name == "CLRec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_heads=2, history_max=6)
    if name == "FourierTA":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8)
    if name == "S3Rec":
        return cls(user_num=N_USERS, item_num=N_ITEMS, emb_size=8,
                   num_heads=2, history_max=6)
    if name.startswith("TiMiRec"):
        return MODEL_REGISTRY["TiMiRec"](
            user_num=N_USERS, item_num=N_ITEMS, emb_size=8, attn_size=4,
            K=2, history_max=6,
            stage="pretrain" if name.endswith("pre") else "finetune")
    raise ValueError(name)


@pytest.mark.parametrize("name", ["BPRMF", "NeuMF", "LightGCN", "DirectAU",
                                  "POP", "SASRec", "GRU4Rec", "Caser",
                                  "NARM", "FPMC", "TiSASRec", "ComiRec",
                                  "BUIR", "ContraRec", "TiMiRec-pre",
                                  "TiMiRec", "SRGNN", "CLRec",
                                  "FourierTA", "S3Rec"])
def test_baseline_forward(rng, name):
    model = build(name, rng)
    name = name.split("-")[0]
    feed = {k: jnp.asarray(v) for k, v in seq_feed(rng).items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           feed, deterministic=True)
    out = model.apply(variables, feed, deterministic=True)
    assert out.shape == (4, 3), name
    assert np.isfinite(np.asarray(out)).all(), name


def test_directau_loss_properties(rng):
    u = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    loss_aligned = DirectAUModel.direct_au_loss(u, u, jnp.ones(16), 1.0)
    i = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    loss_random = DirectAUModel.direct_au_loss(u, i, jnp.ones(16), 1.0)
    # perfect alignment has zero alignment term -> lower loss
    assert float(loss_aligned) < float(loss_random)


def test_buir_momentum_and_loss(rng):
    """BUIR target EMA (BUIR.py:66-71) + bootstrap loss decreases target
    distance for aligned online/target tables."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.segrec.models.general import BUIRModel
    model = MODEL_REGISTRY["BUIR"](user_num=N_USERS, item_num=N_ITEMS,
                                   emb_size=8)
    feed = {k: jnp.asarray(v) for k, v in seq_feed(rng).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, feed,
                        deterministic=True)["params"]
    upd = BUIRModel.momentum_update(params, 0.9)
    want = 0.9 * params["user_target"]["embedding"]         + 0.1 * params["user_online"]["embedding"]
    np.testing.assert_allclose(np.asarray(upd["user_target"]["embedding"]),
                               np.asarray(want), rtol=1e-6)
    loss = BUIRModel.buir_loss(params,
                               feed["user_id"].astype(jnp.int32),
                               feed["item_id"][:, 0].astype(jnp.int32),
                               jnp.ones(4))
    assert np.isfinite(float(loss)) and 0 <= float(loss) <= 4.0
    # gradients must not touch the target tables (requires_grad=False)
    g = jax.grad(lambda p: BUIRModel.buir_loss(
        p, feed["user_id"].astype(jnp.int32),
        feed["item_id"][:, 0].astype(jnp.int32), jnp.ones(4)))(params)
    assert float(jnp.abs(g["user_target"]["embedding"]).max()) == 0.0
    assert float(jnp.abs(g["user_online"]["embedding"]).max()) > 0.0


def test_pop_scores_are_popularity(rng):
    pop = rng.random(N_ITEMS).astype(np.float32)
    model = MODEL_REGISTRY["POP"](popularity=pop)
    feed = {k: jnp.asarray(v) for k, v in seq_feed(rng).items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, feed,
                           deterministic=True)
    out = np.asarray(model.apply(variables, feed, deterministic=True))
    np.testing.assert_allclose(out, pop[np.asarray(feed["item_id"])],
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# MMRec family
# ---------------------------------------------------------------------------

def mm_fixture(rng, with_pos=True):
    from segmminterest_tpu.mmrec.graph import (bipartite_norm_edges,
                                               knn_item_graph)
    users = rng.integers(1, N_USERS, 200)
    items = rng.integers(1, N_ITEMS, 200)
    eu, ei, ev = bipartite_norm_edges(users, items, N_USERS, N_ITEMS)
    d = 17 if with_pos else 16
    v_feat = rng.normal(size=(N_ITEMS, d)).astype(np.float32)
    if with_pos:
        v_feat[:, -1] = rng.random(N_ITEMS)
    mm_edges, mm_values = knn_item_graph(
        v_feat[:, :-1] if with_pos else v_feat, knn_k=4)
    return dict(n_users=N_USERS, n_items=N_ITEMS, edge_u=eu, edge_i=ei,
                edge_values=ev, emb_size=8, v_feat=v_feat,
                mm_edges=mm_edges, mm_values=mm_values)


@pytest.mark.parametrize("name", ["BPR", "LightGCN", "LayerGCN", "FREEDOM",
                                  "BM3", "LATTICE", "MMGCN", "SLMRec"])
def test_mmrec_embeddings(rng, name):
    from segmminterest_tpu.mmrec.models import MMREC_REGISTRY
    model = MMREC_REGISTRY[name](**mm_fixture(rng))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           method="embeddings")
    u, i = model.apply(variables, method="embeddings")
    assert u.shape == (N_USERS, 8) and i.shape == (N_ITEMS, 8), name
    assert np.isfinite(np.asarray(u)).all() and \
        np.isfinite(np.asarray(i)).all(), name


@pytest.mark.parametrize("name", ["FREEDOM", "BM3", "SLMRec"])
def test_mmrec_training_reduces_loss(rng, name):
    from segmminterest_tpu.mmrec.models import MMREC_REGISTRY
    from segmminterest_tpu.mmrec.runner import MMRecConfig, MMRecRunner
    users = rng.integers(1, N_USERS, 300)
    items = rng.integers(1, N_ITEMS, 300)
    model = MMREC_REGISTRY[name](**mm_fixture(rng))
    cfg = MMRecConfig(epochs=3, batch_size=128, learning_rate=1e-2)
    runner = MMRecRunner(model, cfg, users, items, N_ITEMS)
    state = runner.init_state()
    key = jax.random.PRNGKey(0)
    state, loss0, key = runner.fit_epoch(state, key)
    for _ in range(3):
        state, loss1, key = runner.fit_epoch(state, key)
    assert np.isfinite(loss1)
    assert loss1 < loss0 + 1e-3, (name, loss0, loss1)


def test_mmrec_end_to_end(rng):
    from segmminterest_tpu.mmrec.main import main as mm_main
    result = mm_main(["--model", "FREEDOM",
                      "--inter_csv", "/root/reference/SegMM_inter_sample.csv",
                      "--min_interactions", "30", "--num_warmup", "10",
                      "--epochs", "2", "--stopping_step", "2",
                      "--emb_size", "8", "--knn_k", "4",
                      "--feat_dim", "16", "--test_cold", "1"])
    assert "hr@5" in result["best_test_upon_valid"]
    assert 0 <= result["best_test_upon_valid"]["hr@5"] <= 1
    # --test_cold reports both splits (MMRec fork topk_evaluator:235-260);
    # every sampled video appears in training, so cold may be empty
    assert "cold_test" in result and "hot_test" in result
    assert 0 <= result["hot_test"]["hr@5"] <= 1


def test_mmrec_grid_driver(rng):
    """--grid sweeps the product of hyperparameter values and reports every
    (valid, test) pair plus the best-by-test combination — the reference's
    quick_start() loop (quick_start.py:53-100)."""
    from segmminterest_tpu.mmrec.main import main as mm_main
    result = mm_main(["--model", "BPR",
                      "--inter_csv", "/root/reference/SegMM_inter_sample.csv",
                      "--min_interactions", "30", "--num_warmup", "10",
                      "--epochs", "1", "--stopping_step", "1",
                      "--feat_dim", "16",
                      "--grid", "lr=0.01,0.001;emb_size=8"])
    assert len(result["grid"]) == 2
    lrs = [g["params"]["lr"] for g in result["grid"]]
    assert lrs == [0.01, 0.001]
    assert all(g["params"]["emb_size"] == 8 for g in result["grid"])
    assert result["best"] in result["grid"]
    for g in result["grid"]:
        assert "hr@5" in g["best_test_upon_valid"]


def test_mmrec_grid_over_batch_size(rng):
    """--grid can sweep batch_size: the mesh guard must re-check device
    divisibility per trial (100 does not divide over the 8-device conftest
    mesh and must fall back to single-device instead of crashing the
    sharded jit)."""
    from segmminterest_tpu.mmrec.main import main as mm_main
    result = mm_main(["--model", "BPR",
                      "--inter_csv", "/root/reference/SegMM_inter_sample.csv",
                      "--min_interactions", "30", "--num_warmup", "10",
                      "--epochs", "1", "--stopping_step", "1",
                      "--feat_dim", "16", "--emb_size", "8",
                      "--grid", "batch_size=100,128"])
    assert [g["params"]["batch_size"] for g in result["grid"]] == [100, 128]
    for g in result["grid"]:
        assert "hr@5" in g["best_test_upon_valid"]


@pytest.mark.parametrize("mask", [True, False])
def test_interest_topk_matches_fork(rng, mask):
    """interest_topk vs a transliteration of the MMRec fork's
    interest_TopK_{mask,nonmask} (topk_evaluator.py:77-151); tie-free
    interests so the tie-break RNG streams cancel."""
    from segmminterest_tpu.mmrec.runner import interest_topk
    bsz, seq_len = 60, 40
    interests = rng.permutation(bsz * seq_len).astype(np.float64) \
        .reshape(bsz, seq_len) / (bsz * seq_len)
    durations = rng.integers(2, seq_len + 1, size=bsz)
    view_lengths = np.array([rng.integers(0, d) for d in durations])
    # some completed views (vl == dur, excluded by mask variant)
    view_lengths[:7] = durations[:7]

    def oracle():
        it = interests.copy()
        vl = view_lengths.astype(np.int64).flatten()
        if mask:
            valid = vl != durations
            n = int(valid.sum())
            vl, dur = vl[valid], durations[valid]
            x = it[valid]
            m = np.arange(seq_len) < np.broadcast_to(dur[:, None],
                                                     (n, seq_len))
            x = np.where(m, x, float("inf"))
        else:
            valid = vl < 40
            n = int(valid.sum())
            vl = vl[valid]
            x = it[valid]
        permuted = np.array([np.random.permutation(seq_len)
                             for _ in range(n)])
        preds = np.array([x[i, permuted[i]] for i in range(n)])
        sorted_idx = np.argsort(preds, axis=1)
        target = np.argwhere(permuted == vl[:, None])[:, 1]
        gt_rank = np.argmax(sorted_idx == target[:, None], axis=1) + 1
        out = {}
        for k in (1, 3, 5, 10):
            hit = (gt_rank <= k).astype(np.float32)
            out[f"hr@{k}"] = hit.mean()
            out[f"ndcg@{k}"] = (hit / np.log2(gt_rank + 1)).mean()
        return out

    want = oracle()
    got = interest_topk(interests, view_lengths, durations, mask,
                        rng=np.random.default_rng(3))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6,
                                   err_msg=f"mask={mask}:{k}")


def test_s3rec_pretrain_forward(rng):
    """S3Rec self-supervised stage (developing/S3Rec.py:59-113): masked-item
    + segment-prediction BCE terms sown into 'losses'; padded rows
    (row_mask=0) contribute nothing."""
    model = MODEL_REGISTRY["S3Rec"](user_num=N_USERS, item_num=N_ITEMS,
                                    emb_size=8, num_heads=2, history_max=6)
    B, L = 4, 6
    mask_token = N_ITEMS
    feed = {
        "mask_seq": jnp.asarray(rng.integers(0, N_ITEMS, size=(B, L))
                                .astype(np.int32)).at[:, 2].set(mask_token),
        "pos_item": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "neg_item": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "mask_seg_seq": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "pos_seg": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "neg_seg": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "seq_len": jnp.asarray([3, 6, 4, 5]),
        "row_mask": jnp.asarray([True, True, True, False]),
    }
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, feed,
                           deterministic=True)
    variables = {"params": variables["params"]}
    _, mut = model.apply(variables, feed, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["losses"])
    (loss,) = mut["losses"]["s3rec_pretrain"]
    assert np.isfinite(float(loss)) and float(loss) > 0

    # a padded row must not change the objective
    feed_live = dict(feed)
    feed_live["row_mask"] = jnp.asarray([True, True, True, True])
    _, mut2 = model.apply(variables, feed_live, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          mutable=["losses"])
    (loss2,) = mut2["losses"]["s3rec_pretrain"]
    assert float(loss2) != float(loss)  # row 3 now counts


def test_s3rec_feed_builder(segrec_data):
    """Pretrain feed assembly (S3Rec._get_mask_seq): mask token = n_items,
    negatives never collide with the positive at masked positions, segment
    splice keeps unmasked context identical."""
    from segmminterest_tpu.segrec.corpus import Corpus
    from segmminterest_tpu.segrec.feeds import FeedBuilder
    corpus = Corpus(segrec_data, "SegMM")
    fb = FeedBuilder(corpus, "train", task="ranking", num_neg=1,
                     history_max=8, include_history=True,
                     s3rec_pretrain=True, s3rec_mask_ratio=0.5, seed=3)
    batch = next(fb.batches(16, shuffle=True))
    n_items = corpus.n_items
    for k in ("mask_seq", "pos_item", "neg_item", "mask_seg_seq",
              "pos_seg", "neg_seg", "seq_len", "row_mask"):
        assert k in batch, k
    assert batch["mask_seq"].shape == (16, 8)
    masked = batch["mask_seq"] == n_items
    live = batch["row_mask"].astype(bool)
    assert masked[live].any()
    # at masked positions the negative differs from the positive
    bad = (batch["neg_item"] == batch["pos_item"]) & masked
    assert not bad[live].any()
    # valid positions hold real item ids
    L = batch["mask_seq"].shape[1]
    valid = np.arange(L)[None, :] < batch["seq_len"][:, None]
    assert (batch["mask_seq"][live] * valid[live] <= n_items).all()
