"""Knowledge-aware family: triplet construction, relational intervals,
margin loss vs torch, inverse-DFT decay, model forwards, and the Chorus
two-stage CLI flow."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from segmminterest_tpu.segrec.kg import (
    CFKGModel, ChorusModel, KDAModel, KGFeedBuilder, KGMeta, SLRCPlusModel,
    cfkg_margin_loss, kda_freq_init, norm_time)

N_USERS, N_ITEMS = 10, 30


@pytest.fixture()
def kg_dir(tmp_path):
    meta = pd.DataFrame({
        "item_id": [1, 2, 3, 4],
        "i_category": [1, 1, 2, 2],
        "r_next_watch": ["[2, 3]", "[3]", "[]", "[1]"],
    })
    d = tmp_path / "KG"
    d.mkdir()
    meta.to_csv(d / "item_meta.csv", sep="\t", index=False)
    return str(tmp_path), "KG"


def test_kgmeta_triplets(kg_dir):
    """KGReader._construct_kg (:31-73): r_* columns -> triplets with
    relation ids starting at 1; include_attr stacks attribute entities
    after the items and fills share_attr_dict."""
    path, ds = kg_dir
    kg = KGMeta(path, ds, include_attr=False, n_items=N_ITEMS)
    assert kg.item_relations == ["r_next_watch"]
    assert (1, 1, 2) in kg.triplet_set and (4, 1, 1) in kg.triplet_set
    assert len(kg.relation_df) == 4
    assert kg.n_relations == 2

    kg2 = KGMeta(path, ds, include_attr=True, n_items=N_ITEMS)
    assert kg2.attr_relations == ["i_category"]
    assert kg2.n_relations == 3
    # category value 1 maps to entity N_ITEMS + 1
    assert (1, 2, N_ITEMS + 1) in kg2.triplet_set
    assert set(kg2.share_attr_dict[N_ITEMS + 1]) == {1, 2}
    assert set(kg2.share_attr_dict[N_ITEMS + 2]) == {3, 4}
    assert kg2.n_entities == N_ITEMS + 3


def test_norm_time_matches_reference():
    """KDAReader.norm_time (:33-37): max(log2(a/t + 1e-6), 0)."""
    a = np.array([0, 60, 3600, 86400])
    got = norm_time(a, 60)
    want = np.maximum(np.log2(a / 60 + 1e-6), 0)
    np.testing.assert_allclose(got, want)


class FakeKGCorpus:
    """Minimal corpus protocol for KGFeedBuilder tests."""

    def __init__(self, rows):
        df = pd.DataFrame(rows, columns=["user_id", "item_id", "time"])
        df["position"] = df.groupby("user_id").cumcount()
        self.data_df = {"train": df, "dev": df.iloc[:0], "test": df.iloc[:0]}
        self.all_df = df
        self.n_users, self.n_items = N_USERS, N_ITEMS
        self.neg_items = {"train": None, "dev": None, "test": None}
        self.user_feature_names = []
        self.item_feature_names = []
        self.situation_feature_names = []
        self.user_features_arr = {}
        self.item_features_arr = {}
        self.train_clicked_set = {}
        self.residual_clicked_set = {}
        for u, grp in df.groupby("user_id"):
            self.train_clicked_set[int(u)] = set(grp["item_id"])
        his = {}
        for u, i, t in zip(df["user_id"], df["item_id"], df["time"]):
            his.setdefault(int(u), []).append((int(i), int(t)))
        self._his = his
        self.user_his_times = {u: np.array([t for _, t in v])
                               for u, v in his.items()}

    def history_slice(self, user, position, hmax):
        items = self._his.get(int(user), [])[:int(position)][-hmax:]
        return ([i for i, _ in items], [t for _, t in items])


def test_relational_interval(kg_dir):
    """SLRCPlus.Dataset._get_feed_dict (:91-116): slot 0 = repeat gap,
    slot r = time since the most recent relationally-linked interaction."""
    path, ds = kg_dir
    kg = KGMeta(path, ds, n_items=N_ITEMS)
    # user 1 watches 1 (t=100), 2 (t=200), then target evaluation at t=300
    rows = [(1, 1, 100), (1, 2, 200), (1, 2, 300)]
    fb = KGFeedBuilder(FakeKGCorpus(rows), "train", kg=kg, kg_mode="slrc",
                       time_scalar=100, task="ranking", num_neg=1,
                       history_max=8, include_history=True, seed=0)
    fb.actions_before_epoch()
    batch = next(fb.batches(4, shuffle=False))
    # locate the t=300 row (target item 2, history [1@100, 2@200])
    r = list(batch["time"]).index(300)
    ri = batch["relational_interval"][r, 0]   # candidate 0 = the target
    assert ri[0] == pytest.approx(1.0)        # repeat gap (300-200)/100
    # relation 1: (1, r_next_watch, 2) holds -> (300-100)/100
    assert ri[1] == pytest.approx(2.0)


def test_cfkg_margin_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    preds = rng.normal(size=(8, 4)).astype(np.float32)
    margin = 0.7
    got = float(cfkg_margin_loss(jnp.asarray(preds), jnp.ones(8, bool),
                                 margin))
    t = torch.tensor(preds)
    pos, neg = t[:, :2].flatten(), t[:, 2:].flatten()
    want = torch.nn.MarginRankingLoss(margin=margin)(
        pos, neg, torch.ones(16))
    np.testing.assert_allclose(got, float(want), rtol=1e-6)


def test_kda_freq_init_properties(kg_dir):
    path, ds = kg_dir
    kg = KGMeta(path, ds, include_attr=True, n_items=N_ITEMS)
    rows = [(1, 1, 0), (1, 2, 600), (1, 3, 1200), (2, 4, 0), (2, 1, 900)]
    freq_x, n_dft = kda_freq_init(FakeKGCorpus(rows), kg, n_dft=16,
                                  t_scalar=60)
    assert freq_x.shape == (kg.n_relations, n_dft // 2 + 1)
    assert np.isfinite(freq_x).all()
    # DC term of 2*fft = 2*sum of the normalized histogram (real)
    assert abs(freq_x[0, 0].imag) < 1e-9


def kg_feed(rng, B=4, I=3, L=6, R=2, n_rel=3):
    return {
        "user_id": jnp.asarray(rng.integers(1, N_USERS, size=B)),
        "item_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, I))),
        "row_mask": jnp.ones(B, bool),
        "history_item_id": jnp.asarray(
            rng.integers(1, N_ITEMS, size=(B, L))),
        "history_delta_t": jnp.asarray(
            rng.random((B, L)).astype(np.float32) * 3),
        "lengths": jnp.asarray(rng.integers(1, L + 1, size=B)),
        "relational_interval": jnp.asarray(
            np.where(rng.random((B, I, R)) < 0.5, rng.random((B, I, R)),
                     -1).astype(np.float32)),
        "category_id": jnp.asarray(rng.integers(0, 3, size=(B, I))),
        "item_val": jnp.asarray(rng.integers(0, N_ITEMS, size=(B, I,
                                                               n_rel))),
        "head_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, 2))),
        "tail_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, 2))),
        "relation_id": jnp.asarray(rng.integers(0, n_rel, size=B)),
        "value_id": jnp.asarray(rng.integers(0, N_ITEMS, size=B)),
    }


def test_cfkg_forward(rng):
    model = CFKGModel(user_num=N_USERS, entity_num=N_ITEMS + 5,
                      relation_num=3, emb_size=8)
    quad = {"head_id": jnp.asarray(rng.integers(1, N_USERS, size=(4, 4))),
            "tail_id": jnp.asarray(
                rng.integers(N_USERS, N_USERS + N_ITEMS, size=(4, 4))),
            "relation_id": jnp.zeros((4, 4), jnp.int32),
            "row_mask": jnp.ones(4, bool)}
    v = model.init(jax.random.PRNGKey(0), quad)
    out = model.apply(v, quad)
    assert out.shape == (4, 4) and (np.asarray(out) <= 0).all()
    # eval branch: user/item feed
    ev = {"user_id": jnp.arange(1, 5),
          "item_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(4, 3)))}
    out2 = model.apply(v, ev)
    assert out2.shape == (4, 3)


def test_slrcplus_forward(rng):
    model = SLRCPlusModel(user_num=N_USERS, item_num=N_ITEMS,
                          relation_num=2, emb_size=8)
    feed = kg_feed(rng)
    v = model.init(jax.random.PRNGKey(0), feed)
    out = model.apply(v, feed)
    assert out.shape == (4, 3) and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("base", ["BPR", "GMF"])
def test_chorus_forward_both_branches(rng, base):
    model = ChorusModel(user_num=N_USERS, item_num=N_ITEMS,
                        relation_names=("r_complement", "r_substitute"),
                        category_num=3, emb_size=8, stage=2,
                        base_method=base)
    feed = kg_feed(rng, R=3)
    for k in ("head_id", "tail_id", "relation_id", "value_id"):
        feed.pop(k)   # rec branch (KG quadruples would divert the forward)
    v = model.init(jax.random.PRNGKey(0), feed)
    out = model.apply(v, feed)
    assert out.shape == (4, 3) and np.isfinite(np.asarray(out)).all()
    # kg pretrain branch shares the SAME param tree; quadruple layout
    kgb = {"head_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(4, 4))),
           "tail_id": jnp.asarray(rng.integers(1, N_ITEMS, size=(4, 4))),
           "relation_id": jnp.asarray(rng.integers(0, 3, size=(4, 4)))}
    out2 = model.apply(v, kgb)
    assert out2.shape == (4, 4) and (np.asarray(out2) <= 0).all()


def test_kda_forward_and_sown_kg_loss(rng):
    model = KDAModel(user_num=N_USERS, item_num=N_ITEMS,
                     entity_num=N_ITEMS + 5, relation_num=3, freq_dim=9,
                     emb_size=8, num_heads=2, gamma=0.5)
    feed = kg_feed(rng)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, feed)
    out, mut = model.apply({"params": v["params"]}, feed,
                           mutable=["losses"])
    assert out.shape == (4, 3) and np.isfinite(np.asarray(out)).all()
    (kg_loss,) = mut["losses"]["kda_kg"]
    assert np.isfinite(float(kg_loss)) and float(kg_loss) > 0
    # eval feed (no head_id): no sown loss
    ev = {k: val for k, val in feed.items()
          if k not in ("head_id", "tail_id", "relation_id", "value_id")}
    _, mut2 = model.apply({"params": v["params"]}, ev, mutable=["losses"])
    assert "kda_kg" not in mut2.get("losses", {})


def test_kda_idft_decay_matches_reference_formula(rng):
    """RelationalDynamicAggregation.idft_decay (KDA.py:276-285): conjugate-
    symmetric inverse DFT, torch transliteration as oracle."""
    torch = pytest.importorskip("torch")
    R, F, B, H = 3, 9, 2, 4
    real = rng.normal(size=(R, F)).astype(np.float32)
    imag = rng.normal(size=(R, F)).astype(np.float32)
    delta = rng.random((B, H)).astype(np.float32) * 3

    freqs_np = np.concatenate([np.linspace(0, 1, F) / 2.0,
                               -np.linspace(0, 1, F) / 2.0])
    x_real = torch.tensor(np.concatenate([real, real], -1))
    x_imag = torch.tensor(np.concatenate([imag, -imag], -1))
    w = 2.0 * np.pi * torch.tensor(freqs_np, dtype=torch.float64) \
        * torch.tensor(delta).double().unsqueeze(-1)
    real_part = w.cos()[:, :, None, :] * x_real[None, None].double()
    imag_part = w.sin()[:, :, None, :] * x_imag[None, None].double()
    want = ((real_part - imag_part).mean(dim=-1) / 2.0).numpy()

    x_realj = jnp.concatenate([jnp.asarray(real), jnp.asarray(real)], -1)
    x_imagj = jnp.concatenate([jnp.asarray(imag), -jnp.asarray(imag)], -1)
    wj = 2.0 * np.pi * jnp.asarray(freqs_np) \
        * jnp.asarray(delta)[..., None]
    got = ((jnp.cos(wj)[:, :, None, :] * x_realj[None, None]
            - jnp.sin(wj)[:, :, None, :] * x_imagj[None, None])
           .mean(-1) / 2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_chorus_two_stage_end_to_end(segrec_data, tmp_path):
    """Chorus's documented protocol (Chorus.py:9-13): stage 1 KG pretrain
    saved, stage 2 loads it with the scaled-lr optimizer groups."""
    from segmminterest_tpu.segrec.main import main as segrec_main
    ckpt = str(tmp_path / "chorus_kg.msgpack")
    common = ["--model_mode", "Ranking", "--path", segrec_data,
              "--dataset", "SegMM", "--epoch", "1", "--batch_size", "128",
              "--emb_size", "16", "--history_max", "8", "--topk", "3,5",
              "--margin", "1"]
    segrec_main(["--model_name", "Chorus", "--stage", "1",
                 "--model_path", ckpt] + common)
    assert os.path.exists(ckpt)
    fin = segrec_main(["--model_name", "Chorus", "--stage", "2",
                       "--model_path", ckpt, "--load", "1"] + common)
    assert 0.0 <= fin["test"]["HR@3"] <= 1.0


@pytest.mark.slow
@pytest.mark.parametrize("name", ["CFKG", "SLRCPlus", "KDA"])
def test_kg_models_end_to_end(segrec_data, name):
    from segmminterest_tpu.segrec.main import main as segrec_main
    args = ["--model_name", name, "--model_mode", "Ranking",
            "--path", segrec_data, "--dataset", "SegMM", "--epoch", "1",
            "--batch_size", "128", "--emb_size", "16", "--history_max",
            "8", "--topk", "3,5"]
    if name == "CFKG":
        args += ["--margin", "1", "--include_attr", "1"]
    if name == "KDA":
        args += ["--include_attr", "1", "--num_heads", "2"]
    r = segrec_main(args)
    assert 0.0 <= r["test"]["HR@3"] <= 1.0
