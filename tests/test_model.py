"""SegFormerX / SegInterestModel structural tests: shapes, masking
invariances, all fusion heads and input modes, multi-device sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.models.interest import SegInterestModel
from segmminterest_tpu.models.segformerx import SegFormerX

D, H, LAYERS, FF = 32, 4, 3, 64
NU, NI = 50, 200


def id_inputs(rng, B=6, Lv=40):
    usr_id = jnp.asarray(rng.integers(1, NU, size=B))
    vid_id = jnp.asarray(rng.integers(1, NI, size=B))
    vid_mask = np.zeros((B, Lv), bool)
    for i in range(B):
        vid_mask[i, : rng.integers(1, Lv + 1)] = True
    return usr_id, jnp.asarray(vid_mask)


def feat_inputs(rng, B=6, Lv=40, Lu=20, Df=48):
    usr = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, Lv, Df)), jnp.float32)
    usr_mask = np.zeros((B, Lu), bool)
    vid_mask = np.zeros((B, Lv), bool)
    for i in range(B):
        usr_mask[i, : rng.integers(1, Lu + 1)] = True
        vid_mask[i, : rng.integers(1, Lv + 1)] = True
    return usr, jnp.asarray(usr_mask), vid, jnp.asarray(vid_mask)


def test_encoder_feature_mode_shapes(rng):
    usr, usr_mask, vid, vid_mask = feat_inputs(rng)
    enc = SegFormerX(d_model=D, num_heads=H, num_layers=LAYERS, ff_dim=FF,
                     user_id_max=-1, video_id_max=-1, output_layers=[-1],
                     max_usr_len=20)
    params = enc.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)
    states, usr_out = enc.apply(params, usr, usr_mask, vid, vid_mask)
    assert states[-1].shape == (6, 40, D)
    assert usr_out.shape == (6, 20, D)


def test_encoder_id_mode_rank1_inputs(rng):
    usr_id, vid_mask = id_inputs(rng)
    enc = SegFormerX(d_model=D, num_heads=H, num_layers=LAYERS, ff_dim=FF,
                     user_id_max=NU, video_id_max=NI, output_layers=[-1],
                     max_usr_len=1)
    vid_id = jnp.asarray(np.arange(6) + 1)
    params = enc.init(jax.random.PRNGKey(0), usr_id, None, vid_id, vid_mask)
    states, _ = enc.apply(params, usr_id, None, vid_id, vid_mask)
    assert states[-1].shape == (6, 40, D)


def test_padding_keys_do_not_leak(rng):
    """Changing features at masked key positions must not change outputs at
    valid query positions (the -10000 fill)."""
    usr, usr_mask, vid, vid_mask = feat_inputs(rng)
    enc = SegFormerX(d_model=D, num_heads=H, num_layers=LAYERS, ff_dim=FF,
                     user_id_max=-1, video_id_max=-1, output_layers=[-1],
                     max_usr_len=20)
    params = enc.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)
    states1, _ = enc.apply(params, usr, usr_mask, vid, vid_mask)
    vid2 = np.asarray(vid).copy()
    vid2[~np.asarray(vid_mask)] = 99.0
    usr2 = np.asarray(usr).copy()
    usr2[~np.asarray(usr_mask)] = -57.0
    states2, _ = enc.apply(params, jnp.asarray(usr2), usr_mask,
                           jnp.asarray(vid2), vid_mask)
    valid = np.asarray(vid_mask)
    # -10000 fill is softmax-negligible but not exactly -inf; tolerance wide
    # enough for fp32, tight enough to catch a real leak
    np.testing.assert_allclose(np.asarray(states1[-1])[valid],
                               np.asarray(states2[-1])[valid], atol=2e-2)


@pytest.mark.parametrize("fusion_heads", [-3, -2, -1, 0, 1, 2])
def test_fusion_heads_both_mode(rng, fusion_heads):
    B, Lu, Df = 4, 10, 48
    model = SegInterestModel(d_model=D, num_heads=H, num_layers=LAYERS,
                             ff_dim=FF, n_users=NU, n_items=NI,
                             max_usr_len_image=Lu, user_input="both",
                             photo_input="both", fusion_heads=fusion_heads)
    usr_img = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid_img = jnp.asarray(rng.normal(size=(B, 40, Df)), jnp.float32)
    usr_id = jnp.asarray(rng.integers(1, NU, size=B))
    vid_id = jnp.asarray(rng.integers(1, NI, size=B))
    usr_mask = jnp.ones((B, Lu), bool)
    vid_mask = jnp.ones((B, 40), bool)
    params = model.init(jax.random.PRNGKey(0), usr_img, usr_id, usr_mask,
                        vid_img, vid_id, vid_mask)
    logits = model.apply(params, usr_img, usr_id, usr_mask, vid_img, vid_id,
                         vid_mask)
    assert logits.shape == (B, 40)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("user_input,photo_input", [
    ("id", "id"), ("image", "image"), ("both", "both"), ("id", "both")])
def test_input_modes(rng, user_input, photo_input):
    B, Lu, Df = 4, 10, 48
    model = SegInterestModel(d_model=D, num_heads=H, num_layers=LAYERS,
                             ff_dim=FF, n_users=NU, n_items=NI,
                             max_usr_len_image=Lu, user_input=user_input,
                             photo_input=photo_input, fusion_heads=2)
    usr_img = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid_img = jnp.asarray(rng.normal(size=(B, 40, Df)), jnp.float32)
    usr_id = jnp.asarray(rng.integers(1, NU, size=B))
    vid_id = jnp.asarray(rng.integers(1, NI, size=B))
    usr_mask = jnp.ones((B, Lu), bool)
    vid_mask = jnp.ones((B, 40), bool)
    params = model.init(jax.random.PRNGKey(0), usr_img, usr_id, usr_mask,
                        vid_img, vid_id, vid_mask)
    logits = model.apply(params, usr_img, usr_id, usr_mask, vid_img, vid_id,
                         vid_mask)
    assert logits.shape == (B, 40)


def test_learnable_bias_adds_positional_term(rng):
    model = SegInterestModel(d_model=D, num_heads=H, num_layers=LAYERS,
                             ff_dim=FF, n_users=NU, n_items=NI,
                             user_input="id", photo_input="id",
                             learnable_bias=True)
    usr_id, vid_mask = id_inputs(rng, B=4)
    vid_id = jnp.asarray(rng.integers(1, NI, size=4))
    params = model.init(jax.random.PRNGKey(0), usr_id, usr_id, None,
                        vid_id, vid_id, vid_mask)
    logits = model.apply(params, usr_id, usr_id, None, vid_id, vid_id, vid_mask)
    # bias init = ones, so logits(pos) - logits_nobias(pos) = pos + 2
    p2 = jax.tree.map(lambda x: x, params)
    flat = jax.tree_util.tree_flatten_with_path(p2)
    logits_zeroed = model.apply(
        {"params": {**params["params"],
                    "bias_weight": jnp.zeros((1, 40)),
                    "bias_bias": jnp.zeros((1, 40))}},
        usr_id, usr_id, None, vid_id, vid_id, vid_mask)
    diff = np.asarray(logits - logits_zeroed)
    want = np.arange(40) + 2.0
    np.testing.assert_allclose(diff, np.tile(want, (4, 1)), rtol=1e-4)


@pytest.mark.parametrize("ablation", ["CrossAtt", "SelfAtt", "SelfMLP",
                                      "CrossMLP", "w/oAtt"])
def test_ablation_paths(rng, ablation):
    B, Lu, Df = 4, 10, 48
    enc = SegFormerX(d_model=D, num_heads=H, num_layers=6, ff_dim=FF,
                     user_id_max=-1, video_id_max=-1, output_layers=[-1],
                     max_usr_len=Lu, ablation=ablation)
    usr = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 40, Df)), jnp.float32)
    usr_mask = jnp.ones((B, Lu), bool)
    vid_mask = jnp.ones((B, 40), bool)
    params = enc.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)
    states, _ = enc.apply(params, usr, usr_mask, vid, vid_mask)
    assert states[-1].shape == (B, 40, D)


def test_nopos_ablation_permutes_frame_positions(rng):
    """'noPos' in ID mode feeds a random per-row frame-position permutation
    during training and the identity order at eval (encoder.py:392-409)."""
    B, Lu = 4, 10
    enc = SegFormerX(d_model=D, num_heads=H, num_layers=2, ff_dim=FF,
                     user_id_max=30, video_id_max=60, output_layers=[-1],
                     max_usr_len=Lu, ablation="noPos")
    usr = jnp.asarray(rng.integers(1, 30, size=(B,)), jnp.int32)
    vid = jnp.asarray(rng.integers(1, 60, size=(B,)), jnp.int32)
    usr_mask = jnp.ones((B, 1), bool)
    vid_mask = jnp.ones((B, 40), bool)
    params = enc.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)

    def run(deterministic, seed):
        rngs = None if deterministic else \
            {"dropout": jax.random.PRNGKey(seed),
             "permute": jax.random.PRNGKey(seed + 100)}
        states, _ = enc.apply(params, usr, usr_mask, vid, vid_mask,
                              deterministic=deterministic, rngs=rngs)
        return np.asarray(states[-1])

    # eval path is deterministic and repeatable
    np.testing.assert_array_equal(run(True, 0), run(True, 1))
    # train path: different permute keys -> different outputs
    a, b = run(False, 0), run(False, 1)
    assert not np.allclose(a, b)
