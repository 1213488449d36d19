"""sr_ratio / patch-merge pyramid + SegFormerXFPN (PARITY M2 closure).

The conv pyramid is dead configuration in every published reference run
(main_for_seq_leave_earlystop_SegMM.py:94: sr_ratio_lvls=[1]*n,
use_patch_merge=[False]*n), but it is reference capability surface
(encoder.py:23-31,84-96,279-318). Parity is proven the same way as the
exercised paths: our flax encoder's weights are transplanted into the
reference's own torch SegFormerX (executed from /root/reference) and the
intermediate states are compared.

The reference's SegFormerXFPN (encoder.py:523-559) cannot run at all — its
forward calls backbone(vid_feat=..., txt_feat=..., txt_mask=..., word_mask=...)
with keywords SegFormerX.forward does not accept — so the FPN test checks our
working equivalent against the architecture spec directly (adapter/upsample/
out-conv shapes, torch-nearest interpolation semantics, the original-neighbor
top-down quirk).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF_MODELS = "/root/reference/MMinterest/models"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

D, HEADS, LAYERS, FF = 32, 4, 4, 32
B, LU, LV, FEAT = 3, 7, 40, 24
SR_LVLS = (2, 1, 2, 1)
MERGE_LVLS = (False, True, False, False)
OUT_LAYERS = (0, 1, 2, 3)


def build_our_encoder():
    from segmminterest_tpu.models.segformerx import SegFormerX
    return SegFormerX(
        d_model=D, num_heads=HEADS, num_layers=LAYERS, ff_dim=FF,
        max_vid_len=LV, max_usr_len=LU, dropout=0.1,
        user_id_max=-1, video_id_max=-1, use_pe=True,
        output_layers=OUT_LAYERS, sr_ratio_lvls=SR_LVLS,
        use_patch_merge=MERGE_LVLS)


@pytest.fixture()
def batch():
    r = np.random.default_rng(5)
    return {
        "usr": r.normal(size=(B, LU, FEAT)).astype(np.float32),
        "vid": r.normal(size=(B, LV, FEAT)).astype(np.float32),
        "usr_mask": (np.arange(LU)[None, :]
                     < r.integers(3, LU + 1, size=(B, 1))),
        "vid_mask": (np.arange(LV)[None, :]
                     < r.integers(8, LV + 1, size=(B, 1))),
    }


def _our_forward(batch):
    import jax
    import jax.numpy as jnp

    model = build_our_encoder()
    args = (jnp.asarray(batch["usr"]), jnp.asarray(batch["usr_mask"]),
            jnp.asarray(batch["vid"]), jnp.asarray(batch["vid_mask"]))
    params = model.init(jax.random.PRNGKey(0), *args,
                        deterministic=True)["params"]
    states, usr = model.apply({"params": params}, *args, deterministic=True)
    return params, [np.asarray(s) for s in states]


def _port_encoder_params(params, tmodel):
    """flax SegFormerX params -> reference torch SegFormerX state_dict
    (the shared single-backbone porter, tools/ref_torch_loader.py)."""
    import ref_torch_loader as rtl

    sd = dict(tmodel.state_dict())
    rtl.port_encoder(sd, params, LAYERS, prefix="")
    tmodel.load_state_dict(sd)


@pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                    reason="reference checkout unavailable")
def test_pyramid_states_match_reference(batch):
    torch = pytest.importorskip("torch")
    import ref_torch_loader as rtl

    encoder_mod, _ = rtl.load_ref_modules()
    params, ours = _our_forward(batch)

    cfg = types.SimpleNamespace(debug=False, num_layers_enc=LAYERS,
                                ablation_type="ours")
    tmodel = encoder_mod.SegFormerX(
        d_model_in=D, d_model_lvls=[D] * LAYERS,
        num_head_lvls=[HEADS] * LAYERS, ff_dim_lvls=[FF] * LAYERS,
        sr_ratio_lvls=list(SR_LVLS), input_vid_dim=FEAT, input_usr_dim=FEAT,
        max_vid_len=LV, max_usr_len=LU, dropout=0.1,
        use_patch_merge=list(MERGE_LVLS), output_layers=list(OUT_LAYERS),
        model_cfg=cfg, user_id_max=-1, video_id_max=-1, use_pe=1)
    tmodel.eval()
    _port_encoder_params(params, tmodel)

    with torch.no_grad():
        ref_states, _ = tmodel(
            usr_feat=torch.tensor(batch["usr"]),
            usr_mask=torch.tensor(batch["usr_mask"]),
            vid_feat=torch.tensor(batch["vid"]),
            vid_mask=torch.tensor(batch["vid_mask"]))

    # expected pyramid: state 0 full-res, merge before layer 1 halves
    assert ours[0].shape == (B, LV, D)
    for s in ours[1:]:
        assert s.shape == (B, LV // 2, D)
    assert len(ours) == len(ref_states)
    for i, (a, b) in enumerate(zip(ours, ref_states)):
        np.testing.assert_allclose(a, b.numpy(), rtol=2e-4, atol=2e-5,
                                   err_msg=f"state {i}")


def test_pyramid_rejects_fused_attention(batch):
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.models.segformerx import SegFormerX

    model = SegFormerX(
        d_model=D, num_heads=HEADS, num_layers=LAYERS, ff_dim=FF,
        max_vid_len=LV, max_usr_len=LU, user_id_max=-1, video_id_max=-1,
        sr_ratio_lvls=SR_LVLS, use_patch_merge=MERGE_LVLS,
        fused_attention=True, interpret=True)
    with pytest.raises(ValueError, match="unfused"):
        model.init(jax.random.PRNGKey(0),
                   jnp.asarray(batch["usr"]), jnp.asarray(batch["usr_mask"]),
                   jnp.asarray(batch["vid"]), jnp.asarray(batch["vid_mask"]),
                   deterministic=True)


def test_pyramid_batch_row_independence(batch):
    """Conv/pool mix positions within a row, never across rows."""
    import jax
    import jax.numpy as jnp

    model = build_our_encoder()
    args = (jnp.asarray(batch["usr"]), jnp.asarray(batch["usr_mask"]),
            jnp.asarray(batch["vid"]), jnp.asarray(batch["vid_mask"]))
    params = model.init(jax.random.PRNGKey(0), *args,
                        deterministic=True)["params"]
    base, _ = model.apply({"params": params}, *args, deterministic=True)

    vid2 = np.array(batch["vid"])
    vid2[B - 1] += 3.0  # perturb the last row only
    out2, _ = model.apply(
        {"params": params}, args[0], args[1], jnp.asarray(vid2), args[3],
        deterministic=True)
    for a, b in zip(base, out2):
        np.testing.assert_allclose(np.asarray(a)[: B - 1],
                                   np.asarray(b)[: B - 1], atol=1e-6)
        assert not np.allclose(np.asarray(a)[B - 1], np.asarray(b)[B - 1])


def test_pyramid_gradients_flow(batch):
    import jax
    import jax.numpy as jnp

    model = build_our_encoder()
    args = (jnp.asarray(batch["usr"]), jnp.asarray(batch["usr_mask"]),
            jnp.asarray(batch["vid"]), jnp.asarray(batch["vid_mask"]))
    params = model.init(jax.random.PRNGKey(0), *args,
                        deterministic=True)["params"]

    def loss(p):
        states, _ = model.apply({"params": p}, *args, deterministic=True)
        return sum(jnp.sum(s ** 2) for s in states)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # the pyramid-specific params receive gradient
    assert float(np.abs(grads["patch_merge_1"]["kernel"]).sum()) > 0
    assert float(np.abs(grads["layer_0"]["cross_attn"]["sr"]["kernel"]).sum()) > 0


def test_nearest_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from segmminterest_tpu.models.segformerx import _nearest_resize_seq

    r = np.random.default_rng(0)
    for L_in, L_out in [(10, 20), (10, 40), (7, 20), (5, 13)]:
        x = r.normal(size=(2, L_in, 3)).astype(np.float32)
        ours = np.asarray(_nearest_resize_seq(
            __import__("jax.numpy", fromlist=["asarray"]).asarray(x), L_out))
        ref = F.interpolate(torch.tensor(x).transpose(1, 2),
                            L_out).transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, ref, atol=0)


def test_fpn_shapes_and_topdown_quirk():
    """FPN over a 3-level pyramid; the top-down add uses each level's
    ORIGINAL neighbor (encoder.py:555-556), so with identity adapters level 0
    must equal s0 + up(s1) — NOT s0 + up(s1 + up(s2))."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.models.segformerx import (SegFormerXFPN,
                                                     _nearest_resize_seq)

    r = np.random.default_rng(1)
    H = 8
    states = [jnp.asarray(r.normal(size=(2, L, H)).astype(np.float32))
              for L in (40, 20, 10)]
    fpn = SegFormerXFPN(output_layer=(0, 1, 2), fpn_hidden_size=H)
    params = fpn.init(jax.random.PRNGKey(0), states)["params"]
    outs = fpn.apply({"params": params}, states)
    assert [o.shape for o in outs] == [(2, 40, H), (2, 20, H), (2, 10, H)]

    # force identity adapters + identity out-convs to isolate the add order
    import flax
    p = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    eye = np.eye(H, dtype=np.float32)
    for i in range(3):
        p[f"adapter_{i}"]["kernel"] = jnp.asarray(eye)
        p[f"adapter_{i}"]["bias"] = jnp.zeros(H)
        k = np.zeros((3, H, H), np.float32)
        k[1] = eye  # k3 conv with only the center tap set = identity
        p[f"out_conv_{i}"]["kernel"] = jnp.asarray(k)
        p[f"out_conv_{i}"]["bias"] = jnp.zeros(H)
    outs = fpn.apply({"params": p}, states)
    want0 = states[0] + _nearest_resize_seq(states[1], 40)
    want1 = states[1] + _nearest_resize_seq(states[2], 20)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(want0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(want1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(states[2]),
                               atol=1e-5)
