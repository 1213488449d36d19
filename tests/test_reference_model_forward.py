"""Architecture parity by weight transplant: our flax SegInterestModel's
parameters are ported into the REFERENCE torch model
(/root/reference/MMinterest/models/encoder.py + decoder_leave_focal.py,
executed directly) and the two forwards are compared on identical inputs.

This converts "the rebuild matches the reference architecture" from an
assertion into an executable fact: any transcription slip in projections,
concat-KV attention (-10000 pre-scale fill, dropout-on-logits position,
per-head scaling), PE/LN placement, encoder output-layer indexing, fusion
heads, or the loss zoo shows up as a numeric mismatch.

The reference's vendored kn_util package is broken (missing
nn_utils/evaluate.py, torch._six usage); only the modules the model actually
needs (ops/init/math/layers.mlp, basic/ops) are loaded, from the reference's
own files.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODELS = "/root/reference/MMinterest/models"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason="reference checkout unavailable")


def _exec_into(module_name: str, path: str, package: str = ""):
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    # torch._six was removed from modern torch
    six = types.ModuleType("torch._six")
    six.inf = math.inf
    sys.modules.setdefault("torch._six", six)

    import importlib

    # kn_util's package __init__s are broken (missing evaluate.py, heavy
    # unused deps); register the package skeletons with real __path__s so the
    # submodules the model needs load from the reference's own files
    kn = types.ModuleType("kn_util")
    kn.__path__ = [os.path.join(REF_MODELS, "kn_util")]
    sys.modules["kn_util"] = kn

    nn_utils = types.ModuleType("kn_util.nn_utils")
    nn_utils.__path__ = [os.path.join(REF_MODELS, "kn_util/nn_utils")]
    sys.modules["kn_util.nn_utils"] = nn_utils
    kn.nn_utils = nn_utils

    nn_ops = importlib.import_module("kn_util.nn_utils.ops")
    nn_init = importlib.import_module("kn_util.nn_utils.init")
    importlib.import_module("kn_util.nn_utils.math")
    layers = importlib.import_module("kn_util.nn_utils.layers")
    nn_utils.clones = nn_ops.clones
    nn_utils.init_module = nn_init.init_module
    nn_utils.layers = layers

    basic_ops = _exec_into("kn_util._basic_ops",
                           os.path.join(REF_MODELS, "kn_util/basic/ops.py"))
    basic = types.ModuleType("kn_util.basic")
    basic.eval_env = basic_ops.eval_env
    sys.modules["kn_util.basic"] = basic
    kn.basic = basic

    # decoder_leave_focal.py:6 imports (and never uses) a pooler from a
    # `model` package that does not exist anywhere in the reference
    for name in ("model", "model.ms_temporal_detr",
                 "model.ms_temporal_detr.ms_pooler"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["model.ms_temporal_detr.ms_pooler"].MultiScaleRoIAlign1D = \
        object
    # ...and :7 imports iou helpers from a `misc` module that is equally
    # absent; they are only used by compute_iou_loss, which nothing calls
    misc = types.ModuleType("misc")
    misc.cw2se = misc.calc_iou = object
    sys.modules.setdefault("misc", misc)
    # :8 `from .loss import l1_loss, iou_loss` — models/loss.py was never
    # committed; :13 torchvision is absent. Neither symbol is reachable from
    # the forward/compute_loss paths.
    refpkg = types.ModuleType("refpkg")
    refpkg.__path__ = [REF_MODELS]
    sys.modules["refpkg"] = refpkg
    loss_stub = types.ModuleType("refpkg.loss")
    loss_stub.l1_loss = loss_stub.iou_loss = object
    sys.modules["refpkg.loss"] = loss_stub
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.sigmoid_focal_loss = object
    tv.ops = tv_ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)

    encoder = _exec_into("ref_encoder", os.path.join(REF_MODELS, "encoder.py"))
    decoder = _exec_into("refpkg.decoder_leave_focal",
                         os.path.join(REF_MODELS, "decoder_leave_focal.py"),
                         package="refpkg")
    return encoder, decoder


# ---------------------------------------------------------------------------

D, HEADS, LAYERS, FF = 32, 4, 3, 32
N_USERS, N_ITEMS = 10, 20
B, LU, LV, FEAT = 6, 7, 40, 24
USR_MAX_IMG = 16


class RefArgs:
    debug = False
    d_model = D
    nhead = HEADS
    num_layers_enc = LAYERS
    dropout = 0.1
    input_type = {"user": "both", "photo": "both"}
    fusion_heads = 2
    learnable_bias = 0
    exposure_prob = [1.0] * 40
    ablation_type = "ours"
    loss_type_list = ["interestBPR", "focal"]
    loss_weight = {"interestBPR": 1.0, "focal": 1.0, "mse": 1.0}
    mask_loss = False


def build_ref_model(ref_modules):
    encoder, decoder = ref_modules
    args = RefArgs()
    common = dict(
        d_model_in=D, d_model_lvls=[D] * LAYERS, num_head_lvls=[HEADS] * LAYERS,
        ff_dim_lvls=[FF] * LAYERS, input_vid_dim=FEAT, input_usr_dim=FEAT,
        max_vid_len=LV, sr_ratio_lvls=[1] * LAYERS,
        use_patch_merge=[False] * LAYERS, output_layers=[-1], model_cfg=args,
        use_pe=1)
    backbone1 = encoder.SegFormerX(max_usr_len=USR_MAX_IMG, user_id_max=-1,
                                   video_id_max=-1, **common)
    backbone2 = encoder.SegFormerX(max_usr_len=1, user_id_max=N_USERS,
                                   video_id_max=N_ITEMS, **common)
    model = decoder.MultiScaleTemporalDetrLeaveFocal(
        backbone1, backbone2, None, torch.nn.Identity(), args)
    model.eval()
    return model


def build_our_model():
    from segmminterest_tpu.models.interest import SegInterestModel
    return SegInterestModel(
        d_model=D, num_heads=HEADS, num_layers=LAYERS, ff_dim=FF,
        n_users=N_USERS, n_items=N_ITEMS, max_vid_len=LV,
        max_usr_len_image=USR_MAX_IMG, dropout=0.1,
        user_input="both", photo_input="both", fusion_heads=2)


# ---------------------------------------------------------------------------
# flax params -> torch state_dict
# ---------------------------------------------------------------------------

def port_params(params, tmodel):
    sd = dict(tmodel.state_dict())

    def put(key, arr, transpose=False):
        t = torch.tensor(np.asarray(arr, np.float32))
        assert key in sd, key
        t = t.T if transpose else t
        assert sd[key].shape == t.shape, (key, sd[key].shape, t.shape)
        sd[key] = t

    def port_dense(tkey, fl):
        put(tkey + ".weight", fl["kernel"], transpose=True)
        put(tkey + ".bias", fl["bias"])

    def port_ln(tkey, fl):
        put(tkey + ".weight", fl["scale"])
        put(tkey + ".bias", fl["bias"])

    def port_backbone(bb):
        p = params[bb]
        if "embedding" in p["vid_proj"]:
            put(f"{bb}.vid_proj.weight", p["vid_proj"]["embedding"])
            port_dense(f"{bb}.frameid_proj", p["frameid_proj"])
        else:
            port_dense(f"{bb}.vid_proj", p["vid_proj"])
        if "embedding" in p["usr_proj"]:
            put(f"{bb}.usr_proj.weight", p["usr_proj"]["embedding"])
        else:
            port_dense(f"{bb}.usr_proj", p["usr_proj"])
        put(f"{bb}.vid_pe.weight", p["vid_pe"])
        put(f"{bb}.usr_pe.weight", p["usr_pe"])
        port_ln(f"{bb}.vid_ln", p["vid_ln"])
        port_ln(f"{bb}.usr_ln", p["usr_ln"])
        for i in range(LAYERS):
            key = f"layer_{i}"
            if key not in p:
                continue  # flax only builds layers that affect output_layers
            lp = p[key]
            base = f"{bb}.encoder.layers.{i}"
            for stream in ("t2v", "v2v", "t2t", "v2t"):
                for j in range(3):
                    port_dense(f"{base}.cross_attn.{stream}_proj.{j}",
                               lp["cross_attn"][f"{stream}_proj_{j}"])
            port_dense(f"{base}.cross_attn.ff_usr",
                       lp["cross_attn"]["ff_usr"])
            port_dense(f"{base}.cross_attn.ff_vid",
                       lp["cross_attn"]["ff_vid"])
            port_ln(f"{base}.cross_attn.ln_usr", lp["cross_attn"]["ln_usr"])
            port_ln(f"{base}.cross_attn.ln_vid", lp["cross_attn"]["ln_vid"])
            for ff in ("ff_usr", "ff_vid"):
                for j in range(2):
                    port_dense(f"{base}.{ff}.layers.{j}",
                               lp[ff][f"layer_{j}"])
            port_ln(f"{base}.ln_usr", lp["ln_usr"])
            port_ln(f"{base}.ln_vid", lp["ln_vid"])

    port_backbone("backbone1")
    port_backbone("backbone2")
    port_dense("fusion_module.w_x", params["fusion_module"]["w_x"])
    port_dense("fusion_module.w_y", params["fusion_module"]["w_y"])
    put("fusion_module.w_xy", params["fusion_module"]["w_xy"])
    tmodel.load_state_dict(sd)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def batch(rng=None):
    r = np.random.default_rng(7)
    labels = np.full((B, LV), -2, np.int64)
    for i in range(B):
        dur = int(r.integers(4, LV + 1))
        leave = int(r.integers(0, dur))
        labels[i, :leave] = 1
        labels[i, leave] = 0
        labels[i, leave + 1:dur] = -1
    return {
        "usr_image": r.normal(size=(B, LU, FEAT)).astype(np.float32),
        "vid_image": r.normal(size=(B, LV, FEAT)).astype(np.float32),
        "usr_id": r.integers(1, N_USERS, size=B).astype(np.int64),
        "vid_id": r.integers(1, N_ITEMS, size=B).astype(np.int64),
        "usr_mask": (np.arange(LU)[None, :]
                     < r.integers(3, LU + 1, size=(B, 1))),
        "vid_mask": labels != -2,
        "label": labels,
    }


@pytest.mark.slow
def test_forward_logits_match_reference(ref_modules, batch):
    import jax
    import jax.numpy as jnp

    model = build_our_model()
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.asarray(batch["usr_image"]), jnp.asarray(batch["usr_id"]),
        jnp.asarray(batch["usr_mask"]), jnp.asarray(batch["vid_image"]),
        jnp.asarray(batch["vid_id"]), jnp.asarray(batch["vid_mask"]),
        deterministic=True)["params"]
    ours = np.asarray(model.apply(
        {"params": params},
        jnp.asarray(batch["usr_image"]), jnp.asarray(batch["usr_id"]),
        jnp.asarray(batch["usr_mask"]), jnp.asarray(batch["vid_image"]),
        jnp.asarray(batch["vid_id"]), jnp.asarray(batch["vid_mask"]),
        deterministic=True))

    tmodel = build_ref_model(ref_modules)
    port_params(params, tmodel)
    with torch.no_grad():
        out = tmodel(usr_image=torch.tensor(batch["usr_image"]),
                     usr_id=torch.tensor(batch["usr_id"]),
                     usr_mask=torch.tensor(batch["usr_mask"]),
                     vid_image=torch.tensor(batch["vid_image"]),
                     vid_id=torch.tensor(batch["vid_id"]),
                     vid_mask=torch.tensor(batch["vid_mask"]),
                     gt=None, mode="inference")
    ref = out["logits"].numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_loss_dict_matches_reference(ref_modules, batch):
    """The reference model's own compute_loss (focal + interestBPR + mse/mse2
    diagnostics, decoder_leave_focal.py:490-572) vs our pure-function loss zoo
    on identical logits."""
    from segmminterest_tpu.models.losses import compute_loss_dict

    tmodel = build_ref_model(ref_modules)
    r = np.random.default_rng(11)
    logits = r.normal(size=(B, LV)).astype(np.float32)
    gt = torch.tensor(batch["label"].copy())
    with torch.no_grad():
        ref = tmodel.compute_loss(
            stage_logits=torch.tensor(logits)[..., None], gt=gt)

    ours = compute_loss_dict(
        logits, batch["label"], np.ones(B, bool),
        np.asarray(RefArgs.exposure_prob, np.float32),
        tuple(RefArgs.loss_type_list), RefArgs.loss_weight, mask_loss=False)
    for key in ("focal", "interestBPR", "mse", "mse2", "loss"):
        assert float(ours[key]) == pytest.approx(float(ref[key]),
                                                 rel=2e-5, abs=2e-6), key


@pytest.mark.slow
def test_training_trajectory_matches_reference(ref_modules, batch):
    """Five full optimizer steps in lock-step with the reference: identical
    transplanted init, identical batch, dropout 0, AdamW(lr=1e-3, wd=1e-4)
    with global-norm clip 10.0 (main_…SegMM.py:226,296-299). Proves the
    whole training step — forward, loss zoo, grad flow, clipping, decoupled
    weight decay — end to end, not just the forward."""
    import jax
    import jax.numpy as jnp
    import optax
    from segmminterest_tpu.models.losses import compute_loss_dict

    LR, WD, STEPS = 1e-3, 1e-4, 5
    exposure = RefArgs.exposure_prob

    model = build_our_model().clone(dropout=0.0)
    args_j = (jnp.asarray(batch["usr_image"]), jnp.asarray(batch["usr_id"]),
              jnp.asarray(batch["usr_mask"]), jnp.asarray(batch["vid_image"]),
              jnp.asarray(batch["vid_id"]), jnp.asarray(batch["vid_mask"]))
    params = model.init(jax.random.PRNGKey(3), *args_j,
                        deterministic=True)["params"]

    tmodel = build_ref_model(ref_modules)
    tmodel.model_cfg.dropout = 0.0
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    port_params(params, tmodel)
    tmodel.train()

    # ---- ours ----
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(LR, weight_decay=WD))
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, *args_j, deterministic=True)
        ld = compute_loss_dict(logits.astype(jnp.float32),
                               jnp.asarray(batch["label"]),
                               jnp.ones(B, bool),
                               jnp.asarray(exposure, jnp.float32),
                               tuple(RefArgs.loss_type_list),
                               RefArgs.loss_weight)
        return ld["loss"]

    ours_losses = []
    for _ in range(STEPS):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ours_losses.append(float(loss))

    # ---- reference ----
    opt = torch.optim.AdamW([p for p in tmodel.parameters()], lr=LR,
                            weight_decay=WD)
    t_in = dict(usr_image=torch.tensor(batch["usr_image"]),
                usr_id=torch.tensor(batch["usr_id"]),
                usr_mask=torch.tensor(batch["usr_mask"]),
                vid_image=torch.tensor(batch["vid_image"]),
                vid_id=torch.tensor(batch["vid_id"]),
                vid_mask=torch.tensor(batch["vid_mask"]))
    ref_losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        out = tmodel(**t_in, gt=torch.tensor(batch["label"].copy()),
                     mode="train")
        out["loss"].backward()
        torch.nn.utils.clip_grad_norm_(
            [p for p in tmodel.parameters()], 10.0)
        opt.step()
        ref_losses.append(float(out["loss"]))

    np.testing.assert_allclose(ours_losses, ref_losses, rtol=3e-4)
