"""Dual-stream fused attention: BOTH SegFormerX layer streams in ONE Pallas
invocation, epilogue (out-proj, FFN, LayerNorms) left to XLA.

The flagship fuse_qkv configuration (models/segformerx.py
_fused_qkv_forward) issues TWO projection-fused attention kernels per layer
— the video stream (q from vid, blocks over vid/usr) and the user stream
(q from usr, same blocks) — each re-loading both activation tensors from
HBM. This kernel computes both streams per grid step:

    vid stream: q1 = vid@Wq_v2v over k1 = vid@Wk_v2v (block 1)
                q2 = vid@Wq_t2v over k2 = usr@Wk_t2v (block 2), ONE softmax
    usr stream: q1 = usr@Wq_v2t over k1 = vid@Wk_v2t
                q2 = usr@Wq_t2t over k2 = usr@Wk_t2t, ONE softmax

identical per-stream math to attention.fused_proj_two_block_attention
(reference order of operations: encoder.py:44-161 — mask-fill -10000,
dropout on logits, /sqrt(dh), joint softmax over both blocks), sharing
_attn_group_fwd/_attn_group_bwd.

Why it might win (VERDICT r3 #2 — the one untried kernel point): halves the
per-layer invocation count without absorbing the epilogue matmuls that made
the layer-fused kernel (core/layer_kernel.py) lose 4% — XLA keeps its
best-scheduled ops; the kernel amortizes its fixed costs over twice the
work, loads vid/usr activations once per grid step instead of twice, and
exposes the two streams' independent head dots to Mosaic for deeper MXU
pipelining (the round-3 microbenchmarks located the binding constraint in
per-row MXU issue LATENCY, which independent work can hide).

PRNG: one seed per layer; the forward draws stream A's head masks then
stream B's, and the backward replays the identical sequence after one
re-seed (interpret mode salts stream B's heads at head_offset=num_heads —
see attention._dropout_keep).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (_attn_group_bwd, _attn_group_fwd, _grid_semantics,
                        _pick_block_b, _proj, fused_proj_two_block_attention)

# 12 projections in kernel-operand order: stream A (vid) q1 q2 k1 k2 v1 v2,
# then stream B (usr) the same. Block wiring (same as _fused_qkv_forward):
# A: q1/k1/v1 = v2v, q2/k2/v2 = t2v;  B: q1/k1/v1 = v2t, q2/k2/v2 = t2t.
# Per projection, the INPUT it consumes: A.q* <- vid, A.k1/v1 <- vid,
# A.k2/v2 <- usr; B.q* <- usr, B.k1/v1 <- vid, B.k2/v2 <- usr.


def _project_stream(xq, x1, x2, w_refs, sq1, sq2, sk1, sk2, sv1, sv2):
    """Run one stream's six in-kernel projections into VMEM scratch (the
    head loops below slice REFS — Mosaic has no dynamic_slice on values)."""
    (wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2) = w_refs
    sq1[...] = _proj(xq, wq1, bq1)
    sq2[...] = _proj(xq, wq2, bq2)
    sk1[...] = _proj(x1, wk1, bk1)
    sk2[...] = _proj(x2, wk2, bk2)
    sv1[...] = _proj(x1, wv1, bv1)
    sv2[...] = _proj(x2, wv2, bv2)


def _ds_fwd_kernel(seed_ref, xv_ref, xu_ref, *rest,
                   num_heads, qk_dim, v_dim, scale, dropout_rate,
                   deterministic, interpret):
    wa = rest[:12]
    wb = rest[12:24]
    mv_ref, mu_ref, ov_ref, ou_ref = rest[24:28]
    scratch = rest[28:]
    (aq1, aq2, ak1, ak2, av1, av2,
     bq1, bq2, bk1, bk2, bv1, bv2) = scratch
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    seed_val = seed_ref[0] + b
    xv = xv_ref[...]
    xu = xu_ref[...]
    mv = mv_ref[...]
    mu = mu_ref[...]

    common = dict(num_heads=num_heads, qk_dim=qk_dim, v_dim=v_dim,
                  scale=scale, dropout_rate=dropout_rate,
                  deterministic=deterministic, interpret=interpret,
                  seed_val=seed_val)
    # ---- stream A: vid queries ----
    _project_stream(xv, xv, xu, wa, aq1, aq2, ak1, ak2, av1, av2)
    pA1 = (mv[:, :, None] * mv[:, None, :]) > 0
    pA2 = (mv[:, :, None] * mu[:, None, :]) > 0
    _attn_group_fwd(aq1, aq2, ak1, ak2, av1, av2, ov_ref, pA1, pA2,
                    head_offset=0, **common)
    # ---- stream B: usr queries (draws follow A's in the PRNG sequence) ----
    _project_stream(xu, xv, xu, wb, bq1, bq2, bk1, bk2, bv1, bv2)
    pB1 = (mu[:, :, None] * mv[:, None, :]) > 0
    pB2 = (mu[:, :, None] * mu[:, None, :]) > 0
    _attn_group_fwd(bq1, bq2, bk1, bk2, bv1, bv2, ou_ref, pB1, pB2,
                    head_offset=num_heads, **common)


def _ds_bwd_kernel(seed_ref, xv_ref, xu_ref, *rest,
                   num_heads, qk_dim, v_dim, scale, dropout_rate,
                   deterministic, interpret):
    wa = rest[:12]
    wb = rest[12:24]
    mv_ref, mu_ref, gv_ref, gu_ref = rest[24:28]
    dxv_ref, dxu_ref = rest[28:30]
    dwa = rest[30:42]
    dwb = rest[42:54]
    scratch = rest[54:]
    (aq1, aq2, ak1, ak2, av1, av2,
     bq1, bq2, bk1, bk2, bv1, bv2,
     daq1, daq2, dak1, dak2, dav1, dav2,
     dbq1, dbq2, dbk1, dbk2, dbv1, dbv2) = scratch
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    seed_val = seed_ref[0] + b
    xv = xv_ref[...]
    xu = xu_ref[...]
    mv = mv_ref[...]
    mu = mu_ref[...]

    _project_stream(xv, xv, xu, wa, aq1, aq2, ak1, ak2, av1, av2)
    _project_stream(xu, xv, xu, wb, bq1, bq2, bk1, bk2, bv1, bv2)
    pA1 = (mv[:, :, None] * mv[:, None, :]) > 0
    pA2 = (mv[:, :, None] * mu[:, None, :]) > 0
    pB1 = (mu[:, :, None] * mv[:, None, :]) > 0
    pB2 = (mu[:, :, None] * mu[:, None, :]) > 0

    common = dict(num_heads=num_heads, qk_dim=qk_dim, v_dim=v_dim,
                  scale=scale, dropout_rate=dropout_rate,
                  deterministic=deterministic, interpret=interpret,
                  seed_val=seed_val)
    # replay order must equal the forward's: stream A heads, then stream B
    _attn_group_bwd(aq1, aq2, ak1, ak2, av1, av2, gv_ref,
                    daq1, daq2, dak1, dak2, dav1, dav2, pA1, pA2,
                    head_offset=0, **common)
    _attn_group_bwd(bq1, bq2, bk1, bk2, bv1, bv2, gu_ref,
                    dbq1, dbq2, dbk1, dbk2, dbv1, dbv2, pB1, pB2,
                    head_offset=num_heads, **common)

    def dgrad(dy_ref, w_ref):
        return jax.lax.dot_general(
            dy_ref[...], w_ref[...].astype(jnp.float32),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # input grads: vid feeds A.q, A.block1 k/v, B.block1 k/v;
    #              usr feeds B.q, A.block2 k/v, B.block2 k/v
    dxv_ref[...] = (dgrad(daq1, wa[0]) + dgrad(daq2, wa[2])
                    + dgrad(dak1, wa[4]) + dgrad(dav1, wa[8])
                    + dgrad(dbk1, wb[4]) + dgrad(dbv1, wb[8])
                    ).astype(dxv_ref.dtype)
    dxu_ref[...] = (dgrad(dbq1, wb[0]) + dgrad(dbq2, wb[2])
                    + dgrad(dak2, wa[6]) + dgrad(dav2, wa[10])
                    + dgrad(dbk2, wb[6]) + dgrad(dbv2, wb[10])
                    ).astype(dxu_ref.dtype)

    @pl.when(b == 0)
    def _init():
        for ref in dwa + dwb:
            ref[...] = jnp.zeros_like(ref)

    def wgrad(x, dy_ref, w_ref, b_ref2):
        xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        dyf = dy_ref[...].reshape(-1, dy_ref.shape[-1])
        w_ref[...] += jax.lax.dot_general(
            xf, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w_ref.dtype)
        b_ref2[...] += dyf.sum(0).astype(b_ref2.dtype)

    for dy_ref, x, i in ((daq1, xv, 0), (daq2, xv, 1), (dak1, xv, 2),
                         (dak2, xu, 3), (dav1, xv, 4), (dav2, xu, 5)):
        wgrad(x, dy_ref, dwa[2 * i], dwa[2 * i + 1])
    for dy_ref, x, i in ((dbq1, xu, 0), (dbq2, xu, 1), (dbk1, xv, 2),
                         (dbk2, xu, 3), (dbv1, xv, 4), (dbv2, xu, 5)):
        wgrad(x, dy_ref, dwb[2 * i], dwb[2 * i + 1])


def _flat_ws(ws, d):
    out = []
    for w, bias in ws:
        out += [w, bias.reshape(1, d)]
    return out


def _ds_call_fwd(xv, xu, wsa, wsb, mask_v, mask_u,
                 dropout_rate, seed, deterministic, interpret, scale,
                 num_heads):
    B, Lv, d = xv.shape
    Lu = xu.shape[1]
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L: pl.BlockSpec((bt, L, d), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = pl.BlockSpec((d, d), lambda i, *_: (0, 0))
    bias_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0))
    kernel = functools.partial(_ds_fwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    in_specs = [b3(Lv), b3(Lu)]
    for _ in range(12):
        in_specs += [w_spec, bias_spec]
    in_specs += [b2(Lv), b2(Lu)]
    sc = lambda L: pltpu.VMEM((bt, L, d), xv.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=[b3(Lv), b3(Lu)],
        scratch_shapes=[sc(Lv), sc(Lv), sc(Lv), sc(Lu), sc(Lv), sc(Lu),
                        sc(Lu), sc(Lu), sc(Lv), sc(Lu), sc(Lv), sc(Lu)])
    ov, ou = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, Lv, d), xv.dtype),
                   jax.ShapeDtypeStruct((B, Lu, d), xu.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, xv, xu, *_flat_ws(wsa, d), *_flat_ws(wsb, d),
      mask_v.astype(jnp.int32), mask_u.astype(jnp.int32))
    return ov, ou


def _ds_call_bwd(xv, xu, wsa, wsb, mask_v, mask_u, gv, gu,
                 dropout_rate, seed, deterministic, interpret, scale,
                 num_heads):
    B, Lv, d = xv.shape
    Lu = xu.shape[1]
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L: pl.BlockSpec((bt, L, d), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = pl.BlockSpec((d, d), lambda i, *_: (0, 0))
    bias_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0))
    kernel = functools.partial(_ds_bwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    in_specs = [b3(Lv), b3(Lu)]
    for _ in range(12):
        in_specs += [w_spec, bias_spec]
    in_specs += [b2(Lv), b2(Lu), b3(Lv), b3(Lu)]
    out_specs = [b3(Lv), b3(Lu)]
    out_shapes = [jax.ShapeDtypeStruct((B, Lv, d), xv.dtype),
                  jax.ShapeDtypeStruct((B, Lu, d), xu.dtype)]
    for _ in range(12):
        out_specs += [w_spec, bias_spec]
        out_shapes += [jax.ShapeDtypeStruct((d, d), jnp.float32),
                       jax.ShapeDtypeStruct((1, d), jnp.float32)]
    sc = lambda L: pltpu.VMEM((bt, L, d), xv.dtype)
    sf = lambda L: pltpu.VMEM((bt, L, d), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[sc(Lv), sc(Lv), sc(Lv), sc(Lu), sc(Lv), sc(Lu),
                        sc(Lu), sc(Lu), sc(Lv), sc(Lu), sc(Lv), sc(Lu),
                        sf(Lv), sf(Lv), sf(Lv), sf(Lu), sf(Lv), sf(Lu),
                        sf(Lu), sf(Lu), sf(Lv), sf(Lu), sf(Lv), sf(Lu)])
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, xv, xu, *_flat_ws(wsa, d), *_flat_ws(wsb, d),
      mask_v.astype(jnp.int32), mask_u.astype(jnp.int32), gv, gu)
    dxv, dxu = outs[0], outs[1]
    dwsa = tuple((outs[2 + 2 * i], outs[3 + 2 * i].reshape(d))
                 for i in range(6))
    dwsb = tuple((outs[14 + 2 * i], outs[15 + 2 * i].reshape(d))
                 for i in range(6))
    return dxv, dxu, dwsa, dwsb


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_dual(xv, xu, wsa, wsb, mask_v, mask_u,
                dropout_rate, deterministic, interpret, scale, num_heads,
                seed):
    return _ds_call_fwd(xv, xu, wsa, wsb, mask_v, mask_u, dropout_rate,
                        seed, deterministic, interpret, scale, num_heads)


def _ds_fwd_rule(xv, xu, wsa, wsb, mask_v, mask_u,
                 dropout_rate, deterministic, interpret, scale, num_heads,
                 seed):
    out = _fused_dual(xv, xu, wsa, wsb, mask_v, mask_u, dropout_rate,
                      deterministic, interpret, scale, num_heads, seed)
    return out, (xv, xu, wsa, wsb, mask_v, mask_u, seed)


def _ds_bwd_rule(dropout_rate, deterministic, interpret, scale, num_heads,
                 res, g):
    xv, xu, wsa, wsb, mask_v, mask_u, seed = res
    gv, gu = g
    dxv, dxu, dwsa, dwsb = _ds_call_bwd(
        xv, xu, wsa, wsb, mask_v, mask_u, gv, gu, dropout_rate, seed,
        deterministic, interpret, scale, num_heads)
    dwsa = tuple((dw.astype(w.dtype), db.astype(b.dtype))
                 for (dw, db), (w, b) in zip(dwsa, wsa))
    dwsb = tuple((dw.astype(w.dtype), db.astype(b.dtype))
                 for (dw, db), (w, b) in zip(dwsb, wsb))
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dxv, dxu, dwsa, dwsb, f0(mask_v), f0(mask_u), f0(seed))


_fused_dual.defvjp(_ds_fwd_rule, _ds_bwd_rule)


def fused_dual_stream_attention(vid, usr, qkv_vid, qkv_usr,
                                vid_mask, usr_mask, *,
                                num_heads: int,
                                dropout_rate: float = 0.0,
                                seed: Optional[jax.Array] = None,
                                deterministic: bool = True,
                                interpret: bool = False,
                                scale: Optional[float] = None):
    """Both SegFormerX layer streams' projection-fused two-block attention
    in one Pallas invocation (module docstring). ``qkv_vid``/``qkv_usr``
    are 6 (w, b) pairs each in block order (q1, q2, k1, k2, v1, v2); the
    vid stream's blocks are (vid, usr) keyed by (v2v, t2v), the usr
    stream's the same sources keyed by (v2t, t2t). Returns
    (vid_out (B, Lv, d), usr_out (B, Lu, d)).

    Off-TPU (and as the test oracle) falls back to two composed XLA calls —
    identical math per stream; dropout streams differ by construction
    (threefry vs the in-kernel PRNG), exactly as for the other kernels."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.reshape(1).astype(jnp.int32)
    d = vid.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d // num_heads))
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not interpret and not on_tpu:
        def one(xq, ws, mq, s):
            (wq1, bq1), (wq2, bq2), (wk1, bk1), (wk2, bk2), (wv1, bv1), \
                (wv2, bv2) = ws
            return fused_proj_two_block_attention(
                xq, vid, usr, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                wv1, bv1, wv2, bv2, mq, vid_mask, usr_mask,
                num_heads=num_heads, dropout_rate=dropout_rate, seed=s,
                deterministic=deterministic, scale=scale, version=0)
        return (one(vid, qkv_vid, vid_mask, seed),
                one(usr, qkv_usr, usr_mask, seed + 1))
    return _fused_dual(vid, usr, tuple(tuple(p) for p in qkv_vid),
                       tuple(tuple(p) for p in qkv_usr),
                       vid_mask.astype(jnp.int32),
                       usr_mask.astype(jnp.int32),
                       float(dropout_rate), bool(deterministic),
                       bool(interpret), float(scale), int(num_heads), seed)
