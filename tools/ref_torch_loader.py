"""Load the REFERENCE torch model (encoder.py + decoder_leave_focal.py)
directly from /root/reference, working around its broken vendored imports,
and port flax SegInterestModel params into it.

Shared by tests/test_reference_model_forward.py (weight-transplant forward /
loss / lock-step parity) and tools/task1_ref_parity.py (full training-run
parity). The reference's kn_util package is broken (missing
nn_utils/evaluate.py, torch._six usage); only the modules the model actually
needs are loaded, from the reference's own files.
"""

from __future__ import annotations

import importlib
import importlib.util
import math
import os
import sys
import types

import numpy as np

REF_MODELS = "/root/reference/MMinterest/models"

_CACHE = None


def _exec_into(module_name: str, path: str, package: str = ""):
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_modules():
    """(encoder, decoder) modules of the reference, executed from its own
    files with the unresolvable imports stubbed (SURVEY.md §2.A note)."""
    global _CACHE
    if _CACHE is not None:
        return _CACHE

    import torch

    # torch._six was removed from modern torch
    six = types.ModuleType("torch._six")
    six.inf = math.inf
    sys.modules.setdefault("torch._six", six)

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
    _CACHE = (encoder, decoder)
    return _CACHE


def load_ref_evaluation():
    """The reference's my_evaluation.py metric module (TOP_K_leave etc.)."""
    load_ref_modules()  # ensure stubs are in place
    return _exec_into("ref_my_evaluation",
                      os.path.join(REF_MODELS, "my_evaluation.py"))


def make_ref_args(*, d_model, nhead, num_layers_enc, dropout=0.1,
                  fusion_heads=2,
                  loss_type_list=("interestBPR", "focal"),
                  loss_weight=None, exposure_prob=None,
                  user_input="both", photo_input="both"):
    """The argparse-namespace surface the reference model reads
    (main_…SegMM.py:474-576 defaults)."""
    args = types.SimpleNamespace()
    args.debug = False
    args.d_model = d_model
    args.nhead = nhead
    args.num_layers_enc = num_layers_enc
    args.dropout = dropout
    args.input_type = {"user": user_input, "photo": photo_input}
    args.fusion_heads = fusion_heads
    args.learnable_bias = 0
    args.exposure_prob = list(exposure_prob or [1.0] * 40)
    args.ablation_type = "ours"
    args.loss_type_list = list(loss_type_list)
    args.loss_weight = dict(loss_weight or
                            {k: 1.0 for k in
                             list(loss_type_list) + ["mse"]})
    args.mask_loss = False
    return args


def build_ref_model(ref_modules, args, *, d, heads, layers, ff, feat, lv,
                    usr_max_img, n_users, n_items):
    """Dual-backbone 'both'-mode MultiScaleTemporalDetrLeaveFocal, exactly as
    init_model wires it (main_…SegMM.py:60-106)."""
    import torch

    encoder, decoder = ref_modules
    common = dict(
        d_model_in=d, d_model_lvls=[d] * layers,
        num_head_lvls=[heads] * layers, ff_dim_lvls=[ff] * layers,
        input_vid_dim=feat, input_usr_dim=feat, max_vid_len=lv,
        sr_ratio_lvls=[1] * layers, use_patch_merge=[False] * layers,
        output_layers=[-1], model_cfg=args, use_pe=1)
    backbone1 = encoder.SegFormerX(max_usr_len=usr_max_img, user_id_max=-1,
                                   video_id_max=-1, **common)
    backbone2 = encoder.SegFormerX(max_usr_len=1, user_id_max=n_users,
                                   video_id_max=n_items, **common)
    model = decoder.MultiScaleTemporalDetrLeaveFocal(
        backbone1, backbone2, None, torch.nn.Identity(), args)
    model.eval()
    return model


# ---------------------------------------------------------------------------
# flax params -> torch state_dict
# ---------------------------------------------------------------------------

def make_putters(sd):
    """(put, port_dense, port_ln, port_conv1d) writing flax arrays into the
    torch state_dict `sd` with shape checks. conv: flax Conv (k, in, out) ->
    torch Conv1d (out, in, k)."""
    import torch

    def put(key, arr, transpose=False, conv=False):
        t = torch.tensor(np.asarray(arr, np.float32))
        assert key in sd, key
        if transpose:
            t = t.T
        if conv:
            t = t.permute(2, 1, 0)
        assert sd[key].shape == t.shape, (key, sd[key].shape, t.shape)
        sd[key] = t

    def port_dense(tkey, fl):
        put(tkey + ".weight", fl["kernel"], transpose=True)
        put(tkey + ".bias", fl["bias"])

    def port_ln(tkey, fl):
        put(tkey + ".weight", fl["scale"])
        put(tkey + ".bias", fl["bias"])

    def port_conv1d(tkey, fl):
        put(tkey + ".weight", fl["kernel"], conv=True)
        put(tkey + ".bias", fl["bias"])

    return put, port_dense, port_ln, port_conv1d


def port_encoder(sd, p, layers, prefix=""):
    """Port ONE flax SegFormerX param tree into a torch SegFormerX
    state_dict (`prefix` e.g. 'backbone1.'), covering the exercised flat
    path and the sr_ratio/patch-merge pyramid extras (sr conv, patch_merge
    convs, pe_lns)."""
    put, port_dense, port_ln, port_conv1d = make_putters(sd)
    if "embedding" in p["vid_proj"]:
        put(f"{prefix}vid_proj.weight", p["vid_proj"]["embedding"])
        port_dense(f"{prefix}frameid_proj", p["frameid_proj"])
    else:
        port_dense(f"{prefix}vid_proj", p["vid_proj"])
    if "embedding" in p["usr_proj"]:
        put(f"{prefix}usr_proj.weight", p["usr_proj"]["embedding"])
    else:
        port_dense(f"{prefix}usr_proj", p["usr_proj"])
    put(f"{prefix}vid_pe.weight", p["vid_pe"])
    put(f"{prefix}usr_pe.weight", p["usr_pe"])
    port_ln(f"{prefix}vid_ln", p["vid_ln"])
    port_ln(f"{prefix}usr_ln", p["usr_ln"])
    for i in range(layers):
        key = f"layer_{i}"
        if key not in p:
            continue  # flax only builds layers that affect output_layers
        lp = p[key]
        base = f"{prefix}encoder.layers.{i}"
        for stream in ("t2v", "v2v", "t2t", "v2t"):
            for j in range(3):
                port_dense(f"{base}.cross_attn.{stream}_proj.{j}",
                           lp["cross_attn"][f"{stream}_proj_{j}"])
        if "sr" in lp["cross_attn"]:
            port_conv1d(f"{base}.cross_attn.sr", lp["cross_attn"]["sr"])
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
    for i in range(layers):
        if f"patch_merge_{i}" in p:
            port_conv1d(f"{prefix}encoder.patch_merge.{i}",
                        p[f"patch_merge_{i}"])
        if f"pe_ln_{i}" in p:
            port_ln(f"{prefix}encoder.pe_lns.{i}", p[f"pe_ln_{i}"])


def port_params(params, tmodel, layers):
    sd = dict(tmodel.state_dict())
    port_encoder(sd, params["backbone1"], layers, prefix="backbone1.")
    port_encoder(sd, params["backbone2"], layers, prefix="backbone2.")
    put, port_dense, _, _ = make_putters(sd)
    port_dense("fusion_module.w_x", params["fusion_module"]["w_x"])
    port_dense("fusion_module.w_y", params["fusion_module"]["w_y"])
    put("fusion_module.w_xy", params["fusion_module"]["w_xy"])
    tmodel.load_state_dict(sd)
