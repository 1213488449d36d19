"""Fused masked attention Pallas kernel for the SegFormerX four-stream
attention.

Semantics (bit-matching the reference order of operations,
/root/reference/MMinterest/models/encoder.py:44-161):

    logits = q @ k^T                      (per head, NO scale)
    logits = where(mask_q x mask_k, logits, -10000)
    logits = dropout(logits)              (torch-style: zero w.p. p, keep/(1-p);
                                           note this CAN resurrect masked
                                           positions to 0 — reference behavior)
    logits = logits / sqrt(d_head)
    probs  = softmax(logits)              (fp32)
    out    = probs @ v

Why a kernel: at production shapes the (B, H, Lq, Lk) logits/probs tensors
dominate HBM traffic (profiled at ~4x compute-bound step time); here they
live only in VMEM. The backward pass recomputes them (flash-style, no
softmax stats saved — Lk <= 192 fits whole) with the same in-kernel PRNG
stream for the dropout mask.

Grid: (B / block_b,). All heads are processed per block with a static python
loop; head_dim (32) underfills the MXU for the QK^T/AV matmuls but those are
<5% of model FLOPs — the win is the eliminated HBM traffic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .numerics import MASK_FILL_VALUE

import os

# batch tile of the attention grid; 8 is the sublane quantum minimum, larger
# tiles amortize per-block overhead at higher VMEM use (A/B via env)
DEFAULT_BLOCK_B = int(os.environ.get("SEGMM_ATTN_BLOCK_B", "8"))

# projection-fused kernel version: 1 (default) = the round-2 per-block
# kernel; 2 = weight-interleaved concat-KV (one QK + one AV dot per head).
# v2 halves the MXU issue count but measured SLOWER at the flagship shapes
# (13.5 vs 10.9 ms fwd+bwd, tools/kernel_bench.py r3) — the attention loop
# is not issue-bound; kept as an A/B-able experiment (SEGMM_ATTN_V2=1).
ATTN_V2 = os.environ.get("SEGMM_ATTN_V2", "0") == "1"

# grid dimension semantics for the kernels WITHOUT cross-grid-step
# accumulation (every fwd kernel, and the two-block bwd whose outputs are
# all block-local): 'parallel' lets Mosaic reorder/overlap grid steps.
# The projection-fused bwd accumulates dW across the grid and must stay
# 'arbitrary'. A/B via SEGMM_ATTN_PAR_GRID=1.
PAR_GRID = os.environ.get("SEGMM_ATTN_PAR_GRID", "0") == "1"

# Heads statically unrolled per fori_loop group in the v1 projection-fused
# kernels. Default 128/qk_dim (one 128-lane slab). Wider groups (e.g. 8 ->
# a 256-lane slab, still 128-aligned) expose more independent per-head MXU
# dots for pipelining; a FULL 16-head unroll wedges the Mosaic compiler.
HPG_OVERRIDE = int(os.environ.get("SEGMM_ATTN_HPG", "0"))


def _head_group_size(num_heads, qk_dim, v_dim):
    hpg = max(1, 128 // qk_dim)
    if HPG_OVERRIDE:
        cand = HPG_OVERRIDE
        if (num_heads % cand == 0 and (qk_dim * cand) % 128 == 0
                and v_dim == qk_dim):
            return cand
    if num_heads % hpg != 0 or qk_dim * hpg != 128 or v_dim != qk_dim:
        hpg = num_heads     # small models: one static group
    return hpg


def _grid_semantics():
    return ("parallel",) if PAR_GRID else ("arbitrary",)



def _attention_reference(q, k, v, mask_q, mask_k, dropout_rate, seed,
                         deterministic, scale):
    """Pure-jnp fallback (identical math, materialized) for non-TPU backends
    and numerical tests."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    pair = (mask_q[:, None, :, None] > 0) & (mask_k[:, None, None, :] > 0)
    logits = jnp.where(pair, logits, MASK_FILL_VALUE)
    if not deterministic and dropout_rate > 0:
        key = jax.random.wrap_key_data(
            jnp.broadcast_to(seed.astype(jnp.uint32), (2,)),
            impl="threefry2x32")
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, logits.shape)
        logits = jnp.where(keep, logits / (1.0 - dropout_rate), 0.0)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def _dropout_keep(shape, rate, *, interpret, seed_val, salt):
    """Keep-mask: keep iff U(0,1) >= rate. On TPU the in-kernel PRNG is used
    (seeded once per block; heads drawn in order, so forward and backward see
    the same stream). The interpreter has no prng_seed lowering, so interpret
    mode derives bits from an xxhash-style integer mix of the position and
    seed — equally deterministic across fwd/bwd."""
    if not interpret:
        bits = pltpu.prng_random_bits(shape)
        # top 24 bits -> [0, 1); go through int32 (non-negative after >>8)
        # because Mosaic has no uint32 -> float32 cast
        top = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
        u = top.astype(jnp.float32) * (1.0 / (1 << 24))
        return u >= rate
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(2654435761)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * np.uint32(40503)
    k = jax.lax.broadcasted_iota(jnp.uint32, shape, 2) * np.uint32(69069)
    # salt may be a fori_loop tracer (head-group loops) — keep it traced
    h = (r ^ c ^ k) + seed_val.astype(jnp.uint32) * np.uint32(2246822519) \
        + jnp.asarray(salt).astype(jnp.uint32) * np.uint32(3266489917)
    h = (h ^ (h >> 15)) * np.uint32(2246822519)
    h = h ^ (h >> 13)
    u = (h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= rate


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mq_ref, mk_ref, o_ref, *,
                num_heads, qk_dim, v_dim, scale, dropout_rate,
                deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    # broadcast in int32 and compare in 3D — Mosaic cannot reshape i1
    # vectors into a new minor dim
    pair = (mq_ref[...][:, :, None] * mk_ref[...][:, None, :]) > 0
    for h in range(num_heads):
        sl = slice(h * qk_dim, (h + 1) * qk_dim)
        sl_v = slice(h * v_dim, (h + 1) * v_dim)
        q_h = q_ref[:, :, sl]
        k_h = k_ref[:, :, sl]
        v_h = v_ref[:, :, sl_v]
        logits = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = jnp.where(pair, logits, MASK_FILL_VALUE)
        if not deterministic and dropout_rate > 0:
            keep = _dropout_keep(logits.shape, dropout_rate,
                                 interpret=interpret,
                                 seed_val=seed_ref[0] + b, salt=h)
            logits = jnp.where(keep, logits / (1.0 - dropout_rate), 0.0)
        probs = jax.nn.softmax(logits * scale, axis=-1)
        o_ref[:, :, sl_v] = jax.lax.dot_general(
            probs.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mq_ref, mk_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                num_heads, qk_dim, v_dim, scale, dropout_rate,
                deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    # broadcast in int32 and compare in 3D — Mosaic cannot reshape i1
    # vectors into a new minor dim
    pair = (mq_ref[...][:, :, None] * mk_ref[...][:, None, :]) > 0
    for h in range(num_heads):
        sl = slice(h * qk_dim, (h + 1) * qk_dim)
        sl_v = slice(h * v_dim, (h + 1) * v_dim)
        q_h = q_ref[:, :, sl]
        k_h = k_ref[:, :, sl]
        v_h = v_ref[:, :, sl_v]
        g_h = g_ref[:, :, sl_v].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = jnp.where(pair, logits, MASK_FILL_VALUE)
        if not deterministic and dropout_rate > 0:
            # same PRNG stream as the forward: same seed, same head order
            keep = _dropout_keep(logits.shape, dropout_rate,
                                 interpret=interpret,
                                 seed_val=seed_ref[0] + b, salt=h)
            logits = jnp.where(keep, logits / (1.0 - dropout_rate), 0.0)
        probs = jax.nn.softmax(logits * scale, axis=-1)

        # dv = probs^T @ g
        dv_ref[:, :, sl_v] = jax.lax.dot_general(
            probs, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dprobs = g @ v^T
        dp = jax.lax.dot_general(
            g_h, v_h.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dsm = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dlog = dsm * scale
        if not deterministic and dropout_rate > 0:
            dlog = jnp.where(keep, dlog / (1.0 - dropout_rate), 0.0)
        dlog = jnp.where(pair, dlog, 0.0)
        dq_ref[:, :, sl] = jax.lax.dot_general(
            dlog, k_h.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = jax.lax.dot_general(
            dlog, q_h.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pick_block_b(B: int) -> int:
    """Batch tile: 8 (the TPU sublane quantum — the 2D mask blocks require
    multiples of 8) when divisible, else the whole batch."""
    return DEFAULT_BLOCK_B if B % DEFAULT_BLOCK_B == 0 else B


def _call_fwd(q, k, v, mask_q, mask_k, dropout_rate, seed, deterministic,
              interpret, scale):
    B, Lq, H, Dqk = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    bt = _pick_block_b(B)
    qf = q.reshape(B, Lq, H * Dqk)
    kf = k.reshape(B, Lk, H * Dqk)
    vf = v.reshape(B, Lk, H * Dv)
    kernel = functools.partial(_fwd_kernel, num_heads=H, qk_dim=Dqk,
                               v_dim=Dv, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Lq, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dv), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lq), lambda i, *_: (i, 0)),
            pl.BlockSpec((bt, Lk), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, Lq, H * Dv), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * Dv), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, qf, kf, vf, mask_q.astype(jnp.int32), mask_k.astype(jnp.int32))
    return out.reshape(B, Lq, H, Dv)


def _call_bwd(q, k, v, mask_q, mask_k, g, dropout_rate, seed, deterministic,
              interpret, scale):
    B, Lq, H, Dqk = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    bt = _pick_block_b(B)
    qf = q.reshape(B, Lq, H * Dqk)
    kf = k.reshape(B, Lk, H * Dqk)
    vf = v.reshape(B, Lk, H * Dv)
    gf = g.reshape(B, Lq, H * Dv)
    kernel = functools.partial(_bwd_kernel, num_heads=H, qk_dim=Dqk,
                               v_dim=Dv, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Lq, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dv), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lq), lambda i, *_: (i, 0)),
            pl.BlockSpec((bt, Lk), lambda i, *_: (i, 0)),
            pl.BlockSpec((bt, Lq, H * Dv), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, Lq, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dqk), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, Lk, H * Dv), lambda i, *_: (i, 0, 0)),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, H * Dqk), q.dtype),
            jax.ShapeDtypeStruct((B, Lk, H * Dqk), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, H * Dv), v.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, qf, kf, vf, mask_q.astype(jnp.int32), mask_k.astype(jnp.int32),
      gf)
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_attention(q, k, v, mask_q, mask_k, dropout_rate, deterministic,
                     interpret, scale, seed):
    return _call_fwd(q, k, v, mask_q, mask_k, dropout_rate, seed,
                     deterministic, interpret, scale)


def _fused_fwd(q, k, v, mask_q, mask_k, dropout_rate, deterministic,
               interpret, scale, seed):
    out = _call_fwd(q, k, v, mask_q, mask_k, dropout_rate, seed,
                    deterministic, interpret, scale)
    return out, (q, k, v, mask_q, mask_k, seed)


def _fused_bwd(dropout_rate, deterministic, interpret, scale, res, g):
    q, k, v, mask_q, mask_k, seed = res
    dq, dk, dv = _call_bwd(q, k, v, mask_q, mask_k, g, dropout_rate, seed,
                           deterministic, interpret, scale)
    zero_mq = np.zeros(mask_q.shape, dtype=jax.dtypes.float0)
    zero_mk = np.zeros(mask_k.shape, dtype=jax.dtypes.float0)
    zero_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_mq, zero_mk, zero_seed


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def fused_masked_attention(q, k, v, mask_q, mask_k, *,
                           dropout_rate: float = 0.0,
                           seed: Optional[jax.Array] = None,
                           deterministic: bool = True,
                           interpret: bool = False,
                           scale: Optional[float] = None):
    """Public entry. q/k: (B, Lq|Lk, H, Dqk); v: (B, Lk, H, Dv); masks bool.

    ``scale`` defaults to 1/sqrt(Dv) — the reference divides by sqrt(d_head)
    of the MODEL head dim, which is the value dim when q/k are concatenated
    for the split-projection trick. Falls back to the materialized jnp path
    on non-TPU backends unless ``interpret`` forces the Pallas interpreter.
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.reshape(1).astype(jnp.int32)
    if scale is None:
        scale = 1.0 / float(np.sqrt(v.shape[-1]))
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return _attention_reference(q, k, v, mask_q, mask_k, dropout_rate,
                                    seed, deterministic, scale)
    return _fused_attention(q, k, v, mask_q.astype(jnp.int32),
                            mask_k.astype(jnp.int32), float(dropout_rate),
                            bool(deterministic), bool(interpret),
                            float(scale), seed)


# ---------------------------------------------------------------------------
# Native two-block kernels: one query set, two KV blocks with DIFFERENT q
# projections per block, one joint softmax. Earlier rounds expressed this by
# concatenating q halves and zero-padding each key block's complementary half
# into doubled-width HBM tensors before a single-kernel call; profiling showed
# those concat/pad fusions + the doubled-width QK matmuls at ~25% of step
# time. Here the blocks stay separate all the way into VMEM: block logits are
# computed per block, normalized jointly, and nothing widened ever touches
# HBM.
# ---------------------------------------------------------------------------

def _two_block_concat(q1, q2, k1, k2, v1, v2):
    """Materialized equivalence construction (CPU fallback / tests only)."""
    q = jnp.concatenate([q1, q2], axis=-1)
    z1 = jnp.zeros_like(k1)
    z2 = jnp.zeros_like(k2)
    k = jnp.concatenate(
        [jnp.concatenate([k1, z1], -1), jnp.concatenate([z2, k2], -1)],
        axis=1)
    v = jnp.concatenate([v1, v2], axis=1)
    return q, k, v


def _joint_probs(l1, l2, pair1, pair2, scale, dropout_rate, deterministic,
                 interpret, seed_val, h):
    """mask-fill -> dropout -> scale -> joint softmax over both blocks
    (fp32), mirroring the single-kernel order of operations. Returns
    (p1, p2, keep1, keep2)."""
    l1 = jnp.where(pair1, l1, MASK_FILL_VALUE)
    l2 = jnp.where(pair2, l2, MASK_FILL_VALUE)
    keep1 = keep2 = None
    if not deterministic and dropout_rate > 0:
        keep1 = _dropout_keep(l1.shape, dropout_rate, interpret=interpret,
                              seed_val=seed_val, salt=2 * h)
        keep2 = _dropout_keep(l2.shape, dropout_rate, interpret=interpret,
                              seed_val=seed_val, salt=2 * h + 1)
        l1 = jnp.where(keep1, l1 / (1.0 - dropout_rate), 0.0)
        l2 = jnp.where(keep2, l2 / (1.0 - dropout_rate), 0.0)
    l1 = l1 * scale
    l2 = l2 * scale
    m = jnp.maximum(jnp.max(l1, axis=-1, keepdims=True),
                    jnp.max(l2, axis=-1, keepdims=True))
    e1 = jnp.exp(l1 - m)
    e2 = jnp.exp(l2 - m)
    den = e1.sum(-1, keepdims=True) + e2.sum(-1, keepdims=True)
    return e1 / den, e2 / den, keep1, keep2


def _attn_group_fwd(sq1, sq2, sk1, sk2, sv1, sv2, satt, pair1, pair2, *,
                    num_heads, qk_dim, v_dim, scale, dropout_rate,
                    deterministic, interpret, seed_val, head_offset=0):
    """Head-group fori_loop of the two-block joint-softmax attention
    FORWARD: dynamic lane-dim slices must be 128-aligned on TPU, so the
    loop walks groups of 128/qk_dim heads (SEGMM_ATTN_HPG widens the slab)
    and unrolls statically inside each group (a full unroll over all heads
    wedges the Mosaic compiler). Writes the per-head outputs into the
    ``satt`` ref. Shared by _fp_fwd_kernel here,
    layer_kernel._fl_{fwd,bwd}_kernel, and dual_kernel (which passes
    ``head_offset`` so the second stream's interpret-mode dropout salts
    don't collide with the first's; the TPU PRNG stream is ordered by draw
    sequence and needs no offset)."""
    hpg = _head_group_size(num_heads, qk_dim, v_dim)

    def group_body(g, _):
        dq = pl.dslice(g * hpg * qk_dim, hpg * qk_dim)
        dv = pl.dslice(g * hpg * v_dim, hpg * v_dim)
        q1g, q2g = sq1[:, :, dq], sq2[:, :, dq]
        k1g, k2g = sk1[:, :, dq], sk2[:, :, dq]
        v1g, v2g = sv1[:, :, dv], sv2[:, :, dv]
        outs = []
        for j in range(hpg):
            sl = slice(j * qk_dim, (j + 1) * qk_dim)
            sl_v = slice(j * v_dim, (j + 1) * v_dim)
            dims = (((2,), (2,)), ((0,), (0,)))
            l1 = jax.lax.dot_general(q1g[:, :, sl], k1g[:, :, sl], dims,
                                     preferred_element_type=jnp.float32)
            l2 = jax.lax.dot_general(q2g[:, :, sl], k2g[:, :, sl], dims,
                                     preferred_element_type=jnp.float32)
            p1, p2, _, _ = _joint_probs(
                l1, l2, pair1, pair2, scale, dropout_rate, deterministic,
                interpret, seed_val, head_offset + g * hpg + j)
            av = (((2,), (1,)), ((0,), (0,)))
            v1_h = v1g[:, :, sl_v]
            v2_h = v2g[:, :, sl_v]
            outs.append((
                jax.lax.dot_general(p1.astype(v1_h.dtype), v1_h, av,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(p2.astype(v2_h.dtype), v2_h, av,
                                      preferred_element_type=jnp.float32)
            ).astype(satt.dtype))
        satt[:, :, dv] = jnp.concatenate(outs, axis=-1) if hpg > 1 \
            else outs[0]
        return 0

    jax.lax.fori_loop(0, num_heads // hpg, group_body, 0)


def _attn_group_bwd(pq1, pq2, pk1, pk2, pv1, pv2, g_ref,
                    oq1, oq2, ok1, ok2, ov1, ov2, pair1, pair2, *,
                    num_heads, qk_dim, v_dim, scale, dropout_rate,
                    deterministic, interpret, seed_val, head_offset=0):
    """Head-group fori_loop of the two-block joint-softmax attention
    BACKWARD: replays the forward probabilities (same PRNG draw order as
    the forward head loops — on the TPU stream the caller must re-seed
    first) and writes the per-head dq1/dq2/dk1/dk2/dv1/dv2 into the o*
    VMEM scratch refs. Shared by _fp_bwd_kernel here and
    layer_kernel._fl_bwd_kernel."""
    hpg = _head_group_size(num_heads, qk_dim, v_dim)
    drop = (not deterministic) and dropout_rate > 0

    def group_body(g, _):
        dqs = pl.dslice(g * hpg * qk_dim, hpg * qk_dim)
        dvs = pl.dslice(g * hpg * v_dim, hpg * v_dim)
        q1g, q2g = pq1[:, :, dqs], pq2[:, :, dqs]
        k1g, k2g = pk1[:, :, dqs], pk2[:, :, dqs]
        v1g, v2g = pv1[:, :, dvs], pv2[:, :, dvs]
        gg = g_ref[:, :, dvs].astype(jnp.float32)
        acc = {k: [] for k in ("dq1", "dq2", "dk1", "dk2", "dv1", "dv2")}
        for j in range(hpg):
            sl = slice(j * qk_dim, (j + 1) * qk_dim)
            sl_v = slice(j * v_dim, (j + 1) * v_dim)
            dims = (((2,), (2,)), ((0,), (0,)))
            q1_h, q2_h = q1g[:, :, sl], q2g[:, :, sl]
            k1_h, k2_h = k1g[:, :, sl], k2g[:, :, sl]
            v1_h, v2_h = v1g[:, :, sl_v], v2g[:, :, sl_v]
            g_h = gg[:, :, sl_v]
            l1 = jax.lax.dot_general(q1_h, k1_h, dims,
                                     preferred_element_type=jnp.float32)
            l2 = jax.lax.dot_general(q2_h, k2_h, dims,
                                     preferred_element_type=jnp.float32)
            p1, p2, keep1, keep2 = _joint_probs(
                l1, l2, pair1, pair2, scale, dropout_rate, deterministic,
                interpret, seed_val, head_offset + g * hpg + j)
            pt = (((1,), (1,)), ((0,), (0,)))
            acc["dv1"].append(jax.lax.dot_general(
                p1, g_h, pt, preferred_element_type=jnp.float32))
            acc["dv2"].append(jax.lax.dot_general(
                p2, g_h, pt, preferred_element_type=jnp.float32))
            dp1 = jax.lax.dot_general(g_h, v1_h.astype(jnp.float32), dims,
                                      preferred_element_type=jnp.float32)
            dp2 = jax.lax.dot_general(g_h, v2_h.astype(jnp.float32), dims,
                                      preferred_element_type=jnp.float32)
            ssum = (dp1 * p1).sum(-1, keepdims=True) \
                + (dp2 * p2).sum(-1, keepdims=True)
            dl1 = p1 * (dp1 - ssum) * scale
            dl2 = p2 * (dp2 - ssum) * scale
            if drop:
                dl1 = jnp.where(keep1, dl1 / (1.0 - dropout_rate), 0.0)
                dl2 = jnp.where(keep2, dl2 / (1.0 - dropout_rate), 0.0)
            dl1 = jnp.where(pair1, dl1, 0.0)
            dl2 = jnp.where(pair2, dl2, 0.0)
            qk = (((2,), (1,)), ((0,), (0,)))
            acc["dq1"].append(jax.lax.dot_general(
                dl1, k1_h.astype(jnp.float32), qk,
                preferred_element_type=jnp.float32))
            acc["dq2"].append(jax.lax.dot_general(
                dl2, k2_h.astype(jnp.float32), qk,
                preferred_element_type=jnp.float32))
            acc["dk1"].append(jax.lax.dot_general(
                dl1, q1_h.astype(jnp.float32), pt,
                preferred_element_type=jnp.float32))
            acc["dk2"].append(jax.lax.dot_general(
                dl2, q2_h.astype(jnp.float32), pt,
                preferred_element_type=jnp.float32))
        cat = lambda xs: jnp.concatenate(xs, axis=-1) if hpg > 1 else xs[0]
        oq1[:, :, dqs] = cat(acc["dq1"])
        oq2[:, :, dqs] = cat(acc["dq2"])
        ok1[:, :, dqs] = cat(acc["dk1"])
        ok2[:, :, dqs] = cat(acc["dk2"])
        ov1[:, :, dvs] = cat(acc["dv1"])
        ov2[:, :, dvs] = cat(acc["dv2"])
        return 0

    jax.lax.fori_loop(0, num_heads // hpg, group_body, 0)


def _fwd2_kernel(seed_ref, q1_ref, q2_ref, k1_ref, k2_ref, v1_ref, v2_ref,
                 mq_ref, mk1_ref, mk2_ref, o_ref, *,
                 num_heads, qk_dim, v_dim, scale, dropout_rate,
                 deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    pair1 = (mq_ref[...][:, :, None] * mk1_ref[...][:, None, :]) > 0
    pair2 = (mq_ref[...][:, :, None] * mk2_ref[...][:, None, :]) > 0
    for h in range(num_heads):
        sl = slice(h * qk_dim, (h + 1) * qk_dim)
        sl_v = slice(h * v_dim, (h + 1) * v_dim)
        dims = (((2,), (2,)), ((0,), (0,)))
        l1 = jax.lax.dot_general(q1_ref[:, :, sl], k1_ref[:, :, sl], dims,
                                 preferred_element_type=jnp.float32)
        l2 = jax.lax.dot_general(q2_ref[:, :, sl], k2_ref[:, :, sl], dims,
                                 preferred_element_type=jnp.float32)
        p1, p2, _, _ = _joint_probs(l1, l2, pair1, pair2, scale,
                                    dropout_rate, deterministic, interpret,
                                    seed_ref[0] + b, h)
        av = (((2,), (1,)), ((0,), (0,)))
        v1_h = v1_ref[:, :, sl_v]
        v2_h = v2_ref[:, :, sl_v]
        o_ref[:, :, sl_v] = (
            jax.lax.dot_general(p1.astype(v1_h.dtype), v1_h, av,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(p2.astype(v2_h.dtype), v2_h, av,
                                  preferred_element_type=jnp.float32)
        ).astype(o_ref.dtype)


def _bwd2_kernel(seed_ref, q1_ref, q2_ref, k1_ref, k2_ref, v1_ref, v2_ref,
                 mq_ref, mk1_ref, mk2_ref, g_ref,
                 dq1_ref, dq2_ref, dk1_ref, dk2_ref, dv1_ref, dv2_ref, *,
                 num_heads, qk_dim, v_dim, scale, dropout_rate,
                 deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    pair1 = (mq_ref[...][:, :, None] * mk1_ref[...][:, None, :]) > 0
    pair2 = (mq_ref[...][:, :, None] * mk2_ref[...][:, None, :]) > 0
    for h in range(num_heads):
        sl = slice(h * qk_dim, (h + 1) * qk_dim)
        sl_v = slice(h * v_dim, (h + 1) * v_dim)
        dims = (((2,), (2,)), ((0,), (0,)))
        q1_h = q1_ref[:, :, sl]
        q2_h = q2_ref[:, :, sl]
        k1_h = k1_ref[:, :, sl]
        k2_h = k2_ref[:, :, sl]
        v1_h = v1_ref[:, :, sl_v]
        v2_h = v2_ref[:, :, sl_v]
        g_h = g_ref[:, :, sl_v].astype(jnp.float32)
        l1 = jax.lax.dot_general(q1_h, k1_h, dims,
                                 preferred_element_type=jnp.float32)
        l2 = jax.lax.dot_general(q2_h, k2_h, dims,
                                 preferred_element_type=jnp.float32)
        # same PRNG stream as the forward: same seed, same draw order
        p1, p2, keep1, keep2 = _joint_probs(
            l1, l2, pair1, pair2, scale, dropout_rate, deterministic,
            interpret, seed_ref[0] + b, h)

        pt = (((1,), (1,)), ((0,), (0,)))
        dv1_ref[:, :, sl_v] = jax.lax.dot_general(
            p1, g_h, pt, preferred_element_type=jnp.float32
        ).astype(dv1_ref.dtype)
        dv2_ref[:, :, sl_v] = jax.lax.dot_general(
            p2, g_h, pt, preferred_element_type=jnp.float32
        ).astype(dv2_ref.dtype)

        dp1 = jax.lax.dot_general(g_h, v1_h.astype(jnp.float32), dims,
                                  preferred_element_type=jnp.float32)
        dp2 = jax.lax.dot_general(g_h, v2_h.astype(jnp.float32), dims,
                                  preferred_element_type=jnp.float32)
        # joint-softmax backward: the dot term sums over BOTH blocks
        s = (dp1 * p1).sum(-1, keepdims=True) \
            + (dp2 * p2).sum(-1, keepdims=True)
        dl1 = p1 * (dp1 - s) * scale
        dl2 = p2 * (dp2 - s) * scale
        if not deterministic and dropout_rate > 0:
            dl1 = jnp.where(keep1, dl1 / (1.0 - dropout_rate), 0.0)
            dl2 = jnp.where(keep2, dl2 / (1.0 - dropout_rate), 0.0)
        dl1 = jnp.where(pair1, dl1, 0.0)
        dl2 = jnp.where(pair2, dl2, 0.0)
        qk = (((2,), (1,)), ((0,), (0,)))
        dq1_ref[:, :, sl] = jax.lax.dot_general(
            dl1, k1_h.astype(jnp.float32), qk,
            preferred_element_type=jnp.float32).astype(dq1_ref.dtype)
        dq2_ref[:, :, sl] = jax.lax.dot_general(
            dl2, k2_h.astype(jnp.float32), qk,
            preferred_element_type=jnp.float32).astype(dq2_ref.dtype)
        dk1_ref[:, :, sl] = jax.lax.dot_general(
            dl1, q1_h.astype(jnp.float32), pt,
            preferred_element_type=jnp.float32).astype(dk1_ref.dtype)
        dk2_ref[:, :, sl] = jax.lax.dot_general(
            dl2, q2_h.astype(jnp.float32), pt,
            preferred_element_type=jnp.float32).astype(dk2_ref.dtype)


def _call2_fwd(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2,
               dropout_rate, seed, deterministic, interpret, scale):
    B, Lq, H, D = q1.shape
    L1, L2 = k1.shape[1], k2.shape[1]
    Dv = v1.shape[-1]
    bt = _pick_block_b(B)
    flat = lambda x: x.reshape(B, x.shape[1], H * x.shape[-1])
    kernel = functools.partial(_fwd2_kernel, num_heads=H, qk_dim=D,
                               v_dim=Dv, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    b3 = lambda L, W: pl.BlockSpec((bt, L, W), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[b3(Lq, H * D), b3(Lq, H * D), b3(L1, H * D), b3(L2, H * D),
                  b3(L1, H * Dv), b3(L2, H * Dv), b2(Lq), b2(L1), b2(L2)],
        out_specs=b3(Lq, H * Dv),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * Dv), q1.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, flat(q1), flat(q2), flat(k1), flat(k2), flat(v1), flat(v2),
      mask_q.astype(jnp.int32), mask_k1.astype(jnp.int32),
      mask_k2.astype(jnp.int32))
    return out.reshape(B, Lq, H, Dv)


def _call2_bwd(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2, g,
               dropout_rate, seed, deterministic, interpret, scale):
    B, Lq, H, D = q1.shape
    L1, L2 = k1.shape[1], k2.shape[1]
    Dv = v1.shape[-1]
    bt = _pick_block_b(B)
    flat = lambda x: x.reshape(B, x.shape[1], H * x.shape[-1])
    kernel = functools.partial(_bwd2_kernel, num_heads=H, qk_dim=D,
                               v_dim=Dv, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    b3 = lambda L, W: pl.BlockSpec((bt, L, W), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[b3(Lq, H * D), b3(Lq, H * D), b3(L1, H * D), b3(L2, H * D),
                  b3(L1, H * Dv), b3(L2, H * Dv), b2(Lq), b2(L1), b2(L2),
                  b3(Lq, H * Dv)],
        out_specs=[b3(Lq, H * D), b3(Lq, H * D), b3(L1, H * D),
                   b3(L2, H * D), b3(L1, H * Dv), b3(L2, H * Dv)],
    )
    dq1, dq2, dk1, dk2, dv1, dv2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, H * D), q1.dtype),
            jax.ShapeDtypeStruct((B, Lq, H * D), q2.dtype),
            jax.ShapeDtypeStruct((B, L1, H * D), k1.dtype),
            jax.ShapeDtypeStruct((B, L2, H * D), k2.dtype),
            jax.ShapeDtypeStruct((B, L1, H * Dv), v1.dtype),
            jax.ShapeDtypeStruct((B, L2, H * Dv), v2.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, flat(q1), flat(q2), flat(k1), flat(k2), flat(v1), flat(v2),
      mask_q.astype(jnp.int32), mask_k1.astype(jnp.int32),
      mask_k2.astype(jnp.int32), flat(g))
    return (dq1.reshape(q1.shape), dq2.reshape(q2.shape),
            dk1.reshape(k1.shape), dk2.reshape(k2.shape),
            dv1.reshape(v1.shape), dv2.reshape(v2.shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fused_two_block(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2,
                     dropout_rate, deterministic, interpret, scale, seed):
    return _call2_fwd(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2,
                      dropout_rate, seed, deterministic, interpret, scale)


def _two_block_fwd(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2,
                   dropout_rate, deterministic, interpret, scale, seed):
    out = _fused_two_block(q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2,
                           dropout_rate, deterministic, interpret, scale,
                           seed)
    return out, (q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2, seed)


def _two_block_bwd(dropout_rate, deterministic, interpret, scale, res, g):
    q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2, seed = res
    dq1, dq2, dk1, dk2, dv1, dv2 = _call2_bwd(
        q1, q2, k1, k2, v1, v2, mask_q, mask_k1, mask_k2, g,
        dropout_rate, seed, deterministic, interpret, scale)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dq1, dq2, dk1, dk2, dv1, dv2,
            f0(mask_q), f0(mask_k1), f0(mask_k2), f0(seed))


_fused_two_block.defvjp(_two_block_fwd, _two_block_bwd)


def fused_two_block_attention(q1, q2, k1, k2, v1, v2, mask_q, mask_k1,
                              mask_k2, *, dropout_rate: float = 0.0,
                              seed: Optional[jax.Array] = None,
                              deterministic: bool = True,
                              interpret: bool = False,
                              scale: Optional[float] = None):
    """Jointly-normalized attention of one query set over two KV blocks with
    DIFFERENT q projections per block (the SegFormerX concat-KV pattern):
    block 1 logits use q1.k1, block 2 logits q2.k2, one softmax across both.
    All of q1/q2/k1/k2/v1/v2 are (B, L, H, Dh)."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.reshape(1).astype(jnp.int32)
    if scale is None:
        scale = 1.0 / float(np.sqrt(v1.shape[-1]))
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        q, k, v = _two_block_concat(q1, q2, k1, k2, v1, v2)
        mask_k = jnp.concatenate([mask_k1, mask_k2], axis=1)
        return _attention_reference(q, k, v, mask_q, mask_k, dropout_rate,
                                    seed, deterministic, scale)
    return _fused_two_block(q1, q2, k1, k2, v1, v2,
                            mask_q.astype(jnp.int32),
                            mask_k1.astype(jnp.int32),
                            mask_k2.astype(jnp.int32),
                            float(dropout_rate), bool(deterministic),
                            bool(interpret), float(scale), seed)


# ---------------------------------------------------------------------------
# Projection-fused two-block kernels: the 6 QKV projections of a two-block
# attention run INSIDE the kernel, so q/k/v (and in backward dq/dk/dv) never
# materialize in HBM. XLA's cost analysis puts the no-remat flagship step at
# 67 FLOP/byte — memory-bound — and the projection activations are the
# largest single traffic term; fusing them trades nothing (the (d, d) weight
# blocks sit in VMEM across the whole grid).
# ---------------------------------------------------------------------------

def _proj(x, w_ref, b_ref):
    return (jax.lax.dot_general(
        x, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
        + b_ref[...].astype(x.dtype))


def _fp_fwd_kernel(seed_ref, xq_ref, x1_ref, x2_ref,
                   wq1_ref, bq1_ref, wq2_ref, bq2_ref,
                   wk1_ref, bk1_ref, wk2_ref, bk2_ref,
                   wv1_ref, bv1_ref, wv2_ref, bv2_ref,
                   mq_ref, mk1_ref, mk2_ref, o_ref,
                   sq1, sq2, sk1, sk2, sv1, sv2, *,
                   num_heads, qk_dim, v_dim, scale, dropout_rate,
                   deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    xq = xq_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    # projections land in VMEM scratch so the fori_loop below can take
    # per-head slices from REFS (Mosaic has no dynamic_slice on values)
    sq1[...] = _proj(xq, wq1_ref, bq1_ref)
    sq2[...] = _proj(xq, wq2_ref, bq2_ref)
    sk1[...] = _proj(x1, wk1_ref, bk1_ref)
    sk2[...] = _proj(x2, wk2_ref, bk2_ref)
    sv1[...] = _proj(x1, wv1_ref, bv1_ref)
    sv2[...] = _proj(x2, wv2_ref, bv2_ref)
    pair1 = (mq_ref[...][:, :, None] * mk1_ref[...][:, None, :]) > 0
    pair2 = (mq_ref[...][:, :, None] * mk2_ref[...][:, None, :]) > 0

    _attn_group_fwd(sq1, sq2, sk1, sk2, sv1, sv2, o_ref, pair1, pair2,
                    num_heads=num_heads, qk_dim=qk_dim, v_dim=v_dim,
                    scale=scale, dropout_rate=dropout_rate,
                    deterministic=deterministic, interpret=interpret,
                    seed_val=seed_ref[0] + b)


def _fp_bwd_kernel(seed_ref, xq_ref, x1_ref, x2_ref,
                   wq1_ref, bq1_ref, wq2_ref, bq2_ref,
                   wk1_ref, bk1_ref, wk2_ref, bk2_ref,
                   wv1_ref, bv1_ref, wv2_ref, bv2_ref,
                   mq_ref, mk1_ref, mk2_ref, g_ref,
                   dxq_ref, dx1_ref, dx2_ref,
                   dwq1_ref, dbq1_ref, dwq2_ref, dbq2_ref,
                   dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref,
                   dwv1_ref, dbv1_ref, dwv2_ref, dbv2_ref,
                   sq1, sq2, sk1, sk2, sv1, sv2,
                   pq1, pq2, pk1, pk2, pv1, pv2, *,
                   num_heads, qk_dim, v_dim, scale, dropout_rate,
                   deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    xq = xq_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    # projections in VMEM scratch (pq*/pk*/pv*) so the head loop can slice
    # refs (no dynamic_slice on values in Mosaic)
    pq1[...] = _proj(xq, wq1_ref, bq1_ref)
    pq2[...] = _proj(xq, wq2_ref, bq2_ref)
    pk1[...] = _proj(x1, wk1_ref, bk1_ref)
    pk2[...] = _proj(x2, wk2_ref, bk2_ref)
    pv1[...] = _proj(x1, wv1_ref, bv1_ref)
    pv2[...] = _proj(x2, wv2_ref, bv2_ref)
    pair1 = (mq_ref[...][:, :, None] * mk1_ref[...][:, None, :]) > 0
    pair2 = (mq_ref[...][:, :, None] * mk2_ref[...][:, None, :]) > 0

    # Shared grouped backward (see _attn_group_bwd): 128-lane slabs with
    # static per-head unrolling inside; per-head grads land in the VMEM
    # scratch refs (sq1..sv2)
    _attn_group_bwd(pq1, pq2, pk1, pk2, pv1, pv2, g_ref,
                    sq1, sq2, sk1, sk2, sv1, sv2, pair1, pair2,
                    num_heads=num_heads, qk_dim=qk_dim, v_dim=v_dim,
                    scale=scale, dropout_rate=dropout_rate,
                    deterministic=deterministic, interpret=interpret,
                    seed_val=seed_ref[0] + b)
    dq1 = sq1[...]
    dq2 = sq2[...]
    dk1 = sk1[...]
    dk2 = sk2[...]
    dv1 = sv1[...]
    dv2 = sv2[...]

    # chain through the in-kernel projections
    def t_dims():
        return (((2,), (1,)), ((), ()))  # x @ W^T via contracting W dim 1

    def dgrad(dy, w_ref):
        return jax.lax.dot_general(
            dy, w_ref[...].astype(jnp.float32), t_dims(),
            preferred_element_type=jnp.float32)

    dxq_ref[...] = (dgrad(dq1, wq1_ref)
                    + dgrad(dq2, wq2_ref)).astype(dxq_ref.dtype)
    dx1_ref[...] = (dgrad(dk1, wk1_ref)
                    + dgrad(dv1, wv1_ref)).astype(dx1_ref.dtype)
    dx2_ref[...] = (dgrad(dk2, wk2_ref)
                    + dgrad(dv2, wv2_ref)).astype(dx2_ref.dtype)

    # weight/bias grads accumulate across the sequential batch grid
    @pl.when(b == 0)
    def _init():
        for ref in (dwq1_ref, dwq2_ref, dwk1_ref, dwk2_ref, dwv1_ref,
                    dwv2_ref):
            ref[...] = jnp.zeros_like(ref)
        for ref in (dbq1_ref, dbq2_ref, dbk1_ref, dbk2_ref, dbv1_ref,
                    dbv2_ref):
            ref[...] = jnp.zeros_like(ref)

    def wgrad(x, dy, w_ref, b_ref2):
        d = x.shape[-1]
        xf = x.reshape(-1, d).astype(jnp.float32)
        dyf = dy.reshape(-1, dy.shape[-1])
        w_ref[...] += jax.lax.dot_general(
            xf, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w_ref.dtype)
        b_ref2[...] += dyf.sum(0).astype(b_ref2.dtype)

    wgrad(xq, dq1, dwq1_ref, dbq1_ref)
    wgrad(xq, dq2, dwq2_ref, dbq2_ref)
    wgrad(x1, dk1, dwk1_ref, dbk1_ref)
    wgrad(x2, dk2, dwk2_ref, dbk2_ref)
    wgrad(x1, dv1, dwv1_ref, dbv1_ref)
    wgrad(x2, dv2, dwv2_ref, dbv2_ref)


def _fp_call_fwd(xq, x1, x2, ws, mask_q, mask_1, mask_2,
                 dropout_rate, seed, deterministic, interpret, scale,
                 num_heads):
    B, Lq, d = xq.shape
    L1, L2 = x1.shape[1], x2.shape[1]
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L: pl.BlockSpec((bt, L, d), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = pl.BlockSpec((d, d), lambda i, *_: (0, 0))
    bias_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0))
    kernel = functools.partial(_fp_fwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    in_specs = [b3(Lq), b3(L1), b3(L2)]
    for _ in range(6):
        in_specs += [w_spec, bias_spec]
    in_specs += [b2(Lq), b2(L1), b2(L2)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=b3(Lq),
        scratch_shapes=[pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype)])
    flat_ws = []
    for w, bias in ws:
        flat_ws += [w, bias.reshape(1, d)]
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, d), xq.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, xq, x1, x2, *flat_ws,
      mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
      mask_2.astype(jnp.int32))
    return out


def _fp_call_bwd(xq, x1, x2, ws, mask_q, mask_1, mask_2, g,
                 dropout_rate, seed, deterministic, interpret, scale,
                 num_heads):
    B, Lq, d = xq.shape
    L1, L2 = x1.shape[1], x2.shape[1]
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L: pl.BlockSpec((bt, L, d), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = pl.BlockSpec((d, d), lambda i, *_: (0, 0))
    bias_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0))
    kernel = functools.partial(_fp_bwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    in_specs = [b3(Lq), b3(L1), b3(L2)]
    for _ in range(6):
        in_specs += [w_spec, bias_spec]
    in_specs += [b2(Lq), b2(L1), b2(L2), b3(Lq)]
    out_specs = [b3(Lq), b3(L1), b3(L2)]
    out_shapes = [jax.ShapeDtypeStruct((B, Lq, d), xq.dtype),
                  jax.ShapeDtypeStruct((B, L1, d), x1.dtype),
                  jax.ShapeDtypeStruct((B, L2, d), x2.dtype)]
    for w, bias in ws:
        out_specs += [w_spec, bias_spec]
        out_shapes += [jax.ShapeDtypeStruct((d, d), jnp.float32),
                       jax.ShapeDtypeStruct((1, d), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bt, Lq, d), jnp.float32),
                        pltpu.VMEM((bt, Lq, d), jnp.float32),
                        pltpu.VMEM((bt, L1, d), jnp.float32),
                        pltpu.VMEM((bt, L2, d), jnp.float32),
                        pltpu.VMEM((bt, L1, d), jnp.float32),
                        pltpu.VMEM((bt, L2, d), jnp.float32),
                        pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype)])
    flat_ws = []
    for w, bias in ws:
        flat_ws += [w, bias.reshape(1, d)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, xq, x1, x2, *flat_ws,
      mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
      mask_2.astype(jnp.int32), g)
    dxq, dx1, dx2 = outs[0], outs[1], outs[2]
    dws = []
    for i in range(6):
        dws.append((outs[3 + 2 * i], outs[4 + 2 * i].reshape(d)))
    return dxq, dx1, dx2, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22))
def _fused_proj_attention(xq, x1, x2,
                          wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                          wv1, bv1, wv2, bv2, mask_q, mask_1, mask_2,
                          dropout_rate, deterministic, interpret, scale,
                          num_heads, seed):
    ws = [(wq1, bq1), (wq2, bq2), (wk1, bk1), (wk2, bk2), (wv1, bv1),
          (wv2, bv2)]
    return _fp_call_fwd(xq, x1, x2, ws, mask_q, mask_1, mask_2,
                        dropout_rate, seed, deterministic, interpret, scale,
                        num_heads)


def _fp_fwd_rule(xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                 wv1, bv1, wv2, bv2, mask_q, mask_1, mask_2,
                 dropout_rate, deterministic, interpret, scale, num_heads,
                 seed):
    out = _fused_proj_attention(xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1,
                                wk2, bk2, wv1, bv1, wv2, bv2, mask_q,
                                mask_1, mask_2, dropout_rate, deterministic,
                                interpret, scale, num_heads, seed)
    res = (xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1,
           wv2, bv2, mask_q, mask_1, mask_2, seed)
    return out, res


def _fp_bwd_rule(dropout_rate, deterministic, interpret, scale, num_heads,
                 res, g):
    (xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1, wv2,
     bv2, mask_q, mask_1, mask_2, seed) = res
    ws = [(wq1, bq1), (wq2, bq2), (wk1, bk1), (wk2, bk2), (wv1, bv1),
          (wv2, bv2)]
    bwd_call = _fp3_call_bwd if ATTN_V3_BWD else _fp_call_bwd
    dxq, dx1, dx2, dws = bwd_call(
        xq, x1, x2, ws, mask_q, mask_1, mask_2, g, dropout_rate, seed,
        deterministic, interpret, scale, num_heads)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    grads = [dxq, dx1, dx2]
    for (dw, db), (w, bias) in zip(dws, ws):
        grads += [dw.astype(w.dtype), db.astype(bias.dtype)]
    grads += [f0(mask_q), f0(mask_1), f0(mask_2), f0(seed)]
    return tuple(grads)


_fused_proj_attention.defvjp(_fp_fwd_rule, _fp_bwd_rule)


def fused_proj_two_block_attention(xq, x1, x2, wq1, bq1, wq2, bq2,
                                   wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
                                   mask_q, mask_1, mask_2, *,
                                   num_heads: int,
                                   dropout_rate: float = 0.0,
                                   seed: Optional[jax.Array] = None,
                                   deterministic: bool = True,
                                   interpret: bool = False,
                                   scale: Optional[float] = None,
                                   version: Optional[int] = None):
    """Two-block jointly-normalized attention with the SIX QKV projections
    computed in-kernel: q1 = xq@wq1+bq1 attends k1 = x1@wk1+bk1 (block 1)
    and q2 = xq@wq2+bq2 attends k2 = x2@wk2+bk2 (block 2), one softmax over
    both; values likewise from x1/x2. Neither q/k/v nor dq/dk/dv ever touch
    HBM; weight gradients accumulate across the sequential batch grid.
    Returns (B, Lq, d)."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.reshape(1).astype(jnp.int32)
    d = xq.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d // num_heads))
    if version == 0 or (not interpret
                        and jax.default_backend() not in ("tpu", "axon")):
        # composed path: XLA projections + materialized attention. Also
        # selectable on TPU with version=0 — for degenerate shapes (e.g.
        # backbone2's Lq=1 / L2=1 streams) the Pallas grid's per-step fixed
        # overhead can exceed the whole materialized computation.
        if version == 2:
            # an EXPLICIT v2 request must never be silently relabeled (A/B
            # timings would lie) — here the backend forces the composed
            # path, e.g. a kernel benchmark running while the TPU tunnel
            # resolves to CPU
            raise ValueError(
                "version=2 was requested explicitly but the current "
                f"backend ({jax.default_backend()}) routes to the composed "
                "XLA path — run on TPU or pass interpret=True")
        def pr(x, w, bias):
            return (x @ w + bias).reshape(
                x.shape[0], x.shape[1], num_heads, d // num_heads)
        q, k, v = _two_block_concat(
            pr(xq, wq1, bq1), pr(xq, wq2, bq2), pr(x1, wk1, bk1),
            pr(x2, wk2, bk2), pr(x1, wv1, bv1), pr(x2, wv2, bv2))
        mask_k = jnp.concatenate([mask_1, mask_2], axis=1)
        out = _attention_reference(q, k, v, mask_q, mask_k, dropout_rate,
                                   seed, deterministic, scale)
        return out.reshape(xq.shape[0], xq.shape[1], d)
    L1, L2 = x1.shape[1], x2.shape[1]
    v2_explicit = version == 2
    if version is None:
        version = 2 if ATTN_V2 else 1
    if version == 2 and L1 % 8 != 0 and L2 % 8 != 0:
        # the v2 in-kernel sublane split needs one 8-aligned block; an
        # EXPLICIT version=2 request must not be silently mislabeled as v1
        # (A/B timings would lie), while the SEGMM_ATTN_V2 env default may
        # degrade gracefully.
        if v2_explicit:
            raise ValueError(
                f"version=2 requires L1 or L2 to be a multiple of 8 for the "
                f"in-kernel sublane split; got L1={L1}, L2={L2} — use "
                f"version=1 or pad a block")
        version = 1
    if version == 2:
        args_common = (float(dropout_rate), bool(deterministic),
                       bool(interpret), float(scale), int(num_heads), seed)
        if L1 % 8 == 0:
            return _fused_proj_attention_v2(
                xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                wv1, bv1, wv2, bv2, mask_q.astype(jnp.int32),
                mask_1.astype(jnp.int32), mask_2.astype(jnp.int32),
                *args_common)
        # swap blocks so the in-kernel sublane split (rows [0:L1] then
        # [L1:]) starts 8-aligned; the joint softmax is order-invariant
        return _fused_proj_attention_v2(
            xq, x2, x1, wq2, bq2, wq1, bq1, wk2, bk2, wk1, bk1,
            wv2, bv2, wv1, bv1, mask_q.astype(jnp.int32),
            mask_2.astype(jnp.int32), mask_1.astype(jnp.int32),
            *args_common)
    return _fused_proj_attention(
        xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1,
        wv2, bv2, mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
        mask_2.astype(jnp.int32), float(dropout_rate), bool(deterministic),
        bool(interpret), float(scale), int(num_heads), seed)


# ---------------------------------------------------------------------------
# v2 projection-fused kernel: ONE contraction per head over BOTH blocks,
# via weight interleaving — head h of W_q^cat carries [wq1_h|wq2_h] in one
# 2*Dh-wide lane slab, W_k1^cat carries [wk1_h|0], W_k2^cat [0|wk2_h], so
# the in-kernel projections produce the concat-KV layout
# (encoder.py:64-75: q = [q1|q2], K = [[k1|0],[0|k2]], one softmax over
# both blocks) directly, with no HBM-materialized concat (round 1's
# mistake) and half the per-head MXU issues of v1.
#
# MEASURED OUTCOME (tools/kernel_bench.py, round 3): SLOWER than v1 at the
# flagship shapes (video fwd+bwd 13.5 vs 10.9 ms, user 18.8 vs 17.4) —
# per-head matmul issue count is NOT the binding constraint; per-grid-step
# fixed overhead is (see BASELINE.md "revised roofline"). Kept as an
# A/B-able experiment (SEGMM_ATTN_V2=1 / version=2), fully verified against
# the materialized path.
# ---------------------------------------------------------------------------

def _interleave_ws(wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, num_heads):
    d = wq1.shape[0]
    H, Dh = num_heads, wq1.shape[1] // num_heads

    def il(a, b):
        return jnp.concatenate(
            [a.reshape(d, H, Dh), b.reshape(d, H, Dh)], axis=2
        ).reshape(d, 2 * d)

    def il_b(a, b):
        return jnp.concatenate(
            [a.reshape(H, Dh), b.reshape(H, Dh)], axis=1).reshape(2 * d)

    zw = jnp.zeros_like(wk1)
    zb = jnp.zeros_like(bk1)
    return (il(wq1, wq2), il_b(bq1, bq2),
            il(wk1, zw), il_b(bk1, zb),
            il(zw, wk2), il_b(zb, bk2))


def _deinterleave_w(dw, num_heads, slot):
    """(d, 2d) interleaved weight grad -> the (d, d) grad of slot 0 or 1."""
    d = dw.shape[0]
    H, Dh2 = num_heads, dw.shape[1] // num_heads
    return dw.reshape(d, H, 2, Dh2 // 2)[:, :, slot, :].reshape(d, d)


def _deinterleave_b(db, num_heads, slot):
    d2 = db.shape[-1]
    H, Dh2 = num_heads, d2 // num_heads
    return db.reshape(H, 2, Dh2 // 2)[:, slot, :].reshape(d2 // 2)


def _v2_head_groups(num_heads, qk_dim, v_dim):
    """Heads per fori-loop group such that the dynamic lane slices stay
    128-aligned: qk slab = hpg*2*qk_dim, v slab = hpg*v_dim."""
    hpg = max(1, 128 // qk_dim)
    if (num_heads % hpg or qk_dim * hpg != 128 or v_dim != qk_dim):
        hpg = num_heads
    return hpg


def _fp2_fwd_kernel(seed_ref, xq_ref, x1_ref, x2_ref,
                    wq_ref, bq_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
                    wv1_ref, bv1_ref, wv2_ref, bv2_ref,
                    mq_ref, mk1_ref, mk2_ref, o_ref,
                    sq, sk, sv, *,
                    num_heads, qk_dim, v_dim, scale, dropout_rate,
                    deterministic, interpret, l1, l2):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    xq = xq_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    sq[...] = _proj(xq, wq_ref, bq_ref)
    sk[:, :l1, :] = _proj(x1, wk1_ref, bk1_ref)
    sk[:, l1:, :] = _proj(x2, wk2_ref, bk2_ref)
    sv[:, :l1, :] = _proj(x1, wv1_ref, bv1_ref)
    sv[:, l1:, :] = _proj(x2, wv2_ref, bv2_ref)
    mk_cat = jnp.concatenate([mk1_ref[...], mk2_ref[...]], axis=1)
    pair = (mq_ref[...][:, :, None] * mk_cat[:, None, :]) > 0

    hpg = _v2_head_groups(num_heads, qk_dim, v_dim)

    def group_body(g, _):
        qs = pl.dslice(g * hpg * 2 * qk_dim, hpg * 2 * qk_dim)
        vs = pl.dslice(g * hpg * v_dim, hpg * v_dim)
        qg = sq[:, :, qs]
        kg = sk[:, :, qs]
        vg = sv[:, :, vs]
        outs = []
        for j in range(hpg):
            sl = slice(j * 2 * qk_dim, (j + 1) * 2 * qk_dim)
            sl_v = slice(j * v_dim, (j + 1) * v_dim)
            l = jax.lax.dot_general(
                qg[:, :, sl], kg[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            l = jnp.where(pair, l, MASK_FILL_VALUE)
            if not deterministic and dropout_rate > 0:
                keep = _dropout_keep(l.shape, dropout_rate,
                                     interpret=interpret,
                                     seed_val=seed_ref[0] + b,
                                     salt=g * hpg + j)
                l = jnp.where(keep, l / (1.0 - dropout_rate), 0.0)
            p = jax.nn.softmax(l * scale, axis=-1)
            v_h = vg[:, :, sl_v]
            outs.append(jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(o_ref.dtype))
        o_ref[:, :, vs] = jnp.concatenate(outs, axis=-1) if hpg > 1 \
            else outs[0]
        return 0

    jax.lax.fori_loop(0, num_heads // hpg, group_body, 0)


def _fp2_bwd_kernel(seed_ref, xq_ref, x1_ref, x2_ref,
                    wq_ref, bq_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
                    wv1_ref, bv1_ref, wv2_ref, bv2_ref,
                    mq_ref, mk1_ref, mk2_ref, g_ref,
                    dxq_ref, dx1_ref, dx2_ref,
                    dwq_ref, dbq_ref, dwk1_ref, dbk1_ref,
                    dwk2_ref, dbk2_ref, dwv1_ref, dbv1_ref,
                    dwv2_ref, dbv2_ref,
                    sq, sk, sv, dq_s, dk_s, dv_s, *,
                    num_heads, qk_dim, v_dim, scale, dropout_rate,
                    deterministic, interpret, l1, l2):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    xq = xq_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    sq[...] = _proj(xq, wq_ref, bq_ref)
    sk[:, :l1, :] = _proj(x1, wk1_ref, bk1_ref)
    sk[:, l1:, :] = _proj(x2, wk2_ref, bk2_ref)
    sv[:, :l1, :] = _proj(x1, wv1_ref, bv1_ref)
    sv[:, l1:, :] = _proj(x2, wv2_ref, bv2_ref)
    mk_cat = jnp.concatenate([mk1_ref[...], mk2_ref[...]], axis=1)
    pair = (mq_ref[...][:, :, None] * mk_cat[:, None, :]) > 0

    hpg = _v2_head_groups(num_heads, qk_dim, v_dim)

    def group_body(g, _):
        qs = pl.dslice(g * hpg * 2 * qk_dim, hpg * 2 * qk_dim)
        vs = pl.dslice(g * hpg * v_dim, hpg * v_dim)
        qg = sq[:, :, qs]
        kg = sk[:, :, qs]
        vg = sv[:, :, vs]
        gg = g_ref[:, :, vs].astype(jnp.float32)
        acc = {k: [] for k in ("dq", "dk", "dv")}
        for j in range(hpg):
            sl = slice(j * 2 * qk_dim, (j + 1) * 2 * qk_dim)
            sl_v = slice(j * v_dim, (j + 1) * v_dim)
            q_h = qg[:, :, sl]
            k_h = kg[:, :, sl]
            v_h = vg[:, :, sl_v]
            g_h = gg[:, :, sl_v]
            l = jax.lax.dot_general(
                q_h, k_h, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            l = jnp.where(pair, l, MASK_FILL_VALUE)
            keep = None
            if not deterministic and dropout_rate > 0:
                # same PRNG stream as the forward: same seed, same order
                keep = _dropout_keep(l.shape, dropout_rate,
                                     interpret=interpret,
                                     seed_val=seed_ref[0] + b,
                                     salt=g * hpg + j)
                l = jnp.where(keep, l / (1.0 - dropout_rate), 0.0)
            p = jax.nn.softmax(l * scale, axis=-1)

            pt = (((1,), (1,)), ((0,), (0,)))
            acc["dv"].append(jax.lax.dot_general(
                p, g_h, pt, preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(
                g_h, v_h.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
            if keep is not None:
                dl = jnp.where(keep, dl / (1.0 - dropout_rate), 0.0)
            dl = jnp.where(pair, dl, 0.0)
            qk = (((2,), (1,)), ((0,), (0,)))
            acc["dq"].append(jax.lax.dot_general(
                dl, k_h.astype(jnp.float32), qk,
                preferred_element_type=jnp.float32))
            acc["dk"].append(jax.lax.dot_general(
                dl, q_h.astype(jnp.float32), pt,
                preferred_element_type=jnp.float32))
        cat = lambda xs: jnp.concatenate(xs, axis=-1) if hpg > 1 else xs[0]
        dq_s[:, :, qs] = cat(acc["dq"])
        dk_s[:, :, qs] = cat(acc["dk"])
        dv_s[:, :, vs] = cat(acc["dv"])
        return 0

    jax.lax.fori_loop(0, num_heads // hpg, group_body, 0)
    dq = dq_s[...]
    dk1 = dk_s[:, :l1, :]
    dk2 = dk_s[:, l1:, :]
    dv1 = dv_s[:, :l1, :]
    dv2 = dv_s[:, l1:, :]

    t_dims = (((2,), (1,)), ((), ()))   # x @ W^T via contracting W dim 1

    def dgrad(dy, w_ref):
        return jax.lax.dot_general(
            dy, w_ref[...].astype(jnp.float32), t_dims,
            preferred_element_type=jnp.float32)

    dxq_ref[...] = dgrad(dq, wq_ref).astype(dxq_ref.dtype)
    dx1_ref[...] = (dgrad(dk1, wk1_ref)
                    + dgrad(dv1, wv1_ref)).astype(dx1_ref.dtype)
    dx2_ref[...] = (dgrad(dk2, wk2_ref)
                    + dgrad(dv2, wv2_ref)).astype(dx2_ref.dtype)

    # weight/bias grads accumulate across the sequential batch grid
    @pl.when(b == 0)
    def _init():
        for ref in (dwq_ref, dwk1_ref, dwk2_ref, dwv1_ref, dwv2_ref,
                    dbq_ref, dbk1_ref, dbk2_ref, dbv1_ref, dbv2_ref):
            ref[...] = jnp.zeros_like(ref)

    def wgrad(x, dy, w_ref, b_ref2):
        d_in = x.shape[-1]
        xf = x.reshape(-1, d_in).astype(jnp.float32)
        dyf = dy.reshape(-1, dy.shape[-1])
        w_ref[...] += jax.lax.dot_general(
            xf, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w_ref.dtype)
        b_ref2[...] += dyf.sum(0).astype(b_ref2.dtype)

    wgrad(xq, dq, dwq_ref, dbq_ref)
    wgrad(x1, dk1, dwk1_ref, dbk1_ref)
    wgrad(x2, dk2, dwk2_ref, dbk2_ref)
    wgrad(x1, dv1, dwv1_ref, dbv1_ref)
    wgrad(x2, dv2, dwv2_ref, dbv2_ref)


def _fp2_call_fwd(xq, x1, x2, cws, vws, mask_q, mask_1, mask_2,
                  dropout_rate, seed, deterministic, interpret, scale,
                  num_heads):
    B, Lq, d = xq.shape
    L1, L2 = x1.shape[1], x2.shape[1]
    Lk = L1 + L2
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L, W: pl.BlockSpec((bt, L, W), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = lambda W: pl.BlockSpec((d, W), lambda i, *_: (0, 0))
    bias_spec = lambda W: pl.BlockSpec((1, W), lambda i, *_: (0, 0))
    kernel = functools.partial(_fp2_fwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret, l1=L1, l2=L2)
    in_specs = [b3(Lq, d), b3(L1, d), b3(L2, d)]
    for _ in range(3):
        in_specs += [w_spec(2 * d), bias_spec(2 * d)]
    for _ in range(2):
        in_specs += [w_spec(d), bias_spec(d)]
    in_specs += [b2(Lq), b2(L1), b2(L2)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=b3(Lq, d),
        scratch_shapes=[pltpu.VMEM((bt, Lq, 2 * d), xq.dtype),
                        pltpu.VMEM((bt, Lk, 2 * d), xq.dtype),
                        pltpu.VMEM((bt, Lk, d), xq.dtype)])
    flat_ws = []
    for w, bias in cws:
        flat_ws += [w, bias.reshape(1, 2 * d)]
    for w, bias in vws:
        flat_ws += [w, bias.reshape(1, d)]
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, d), xq.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=_grid_semantics()),
        interpret=interpret,
    )(seed, xq, x1, x2, *flat_ws,
      mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
      mask_2.astype(jnp.int32))
    return out


def _fp2_call_bwd(xq, x1, x2, cws, vws, mask_q, mask_1, mask_2, g,
                  dropout_rate, seed, deterministic, interpret, scale,
                  num_heads):
    B, Lq, d = xq.shape
    L1, L2 = x1.shape[1], x2.shape[1]
    Lk = L1 + L2
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L, W: pl.BlockSpec((bt, L, W), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = lambda W: pl.BlockSpec((d, W), lambda i, *_: (0, 0))
    bias_spec = lambda W: pl.BlockSpec((1, W), lambda i, *_: (0, 0))
    kernel = functools.partial(_fp2_bwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret, l1=L1, l2=L2)
    in_specs = [b3(Lq, d), b3(L1, d), b3(L2, d)]
    for _ in range(3):
        in_specs += [w_spec(2 * d), bias_spec(2 * d)]
    for _ in range(2):
        in_specs += [w_spec(d), bias_spec(d)]
    in_specs += [b2(Lq), b2(L1), b2(L2), b3(Lq, d)]
    out_specs = [b3(Lq, d), b3(L1, d), b3(L2, d)]
    out_shapes = [jax.ShapeDtypeStruct((B, Lq, d), xq.dtype),
                  jax.ShapeDtypeStruct((B, L1, d), x1.dtype),
                  jax.ShapeDtypeStruct((B, L2, d), x2.dtype)]
    for _ in range(3):
        out_specs += [w_spec(2 * d), bias_spec(2 * d)]
        out_shapes += [jax.ShapeDtypeStruct((d, 2 * d), jnp.float32),
                       jax.ShapeDtypeStruct((1, 2 * d), jnp.float32)]
    for _ in range(2):
        out_specs += [w_spec(d), bias_spec(d)]
        out_shapes += [jax.ShapeDtypeStruct((d, d), jnp.float32),
                       jax.ShapeDtypeStruct((1, d), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bt, Lq, 2 * d), xq.dtype),
                        pltpu.VMEM((bt, Lk, 2 * d), xq.dtype),
                        pltpu.VMEM((bt, Lk, d), xq.dtype),
                        pltpu.VMEM((bt, Lq, 2 * d), jnp.float32),
                        pltpu.VMEM((bt, Lk, 2 * d), jnp.float32),
                        pltpu.VMEM((bt, Lk, d), jnp.float32)])
    flat_ws = []
    for w, bias in cws:
        flat_ws += [w, bias.reshape(1, 2 * d)]
    for w, bias in vws:
        flat_ws += [w, bias.reshape(1, d)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, xq, x1, x2, *flat_ws,
      mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
      mask_2.astype(jnp.int32), g)
    dxq, dx1, dx2 = outs[0], outs[1], outs[2]
    dcws = [(outs[3 + 2 * i], outs[4 + 2 * i].reshape(2 * d))
            for i in range(3)]
    dvws = [(outs[9 + 2 * i], outs[10 + 2 * i].reshape(d))
            for i in range(2)]
    return dxq, dx1, dx2, dcws, dvws


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22))
def _fused_proj_attention_v2(xq, x1, x2,
                             wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                             wv1, bv1, wv2, bv2, mask_q, mask_1, mask_2,
                             dropout_rate, deterministic, interpret, scale,
                             num_heads, seed):
    wq_c, bq_c, wk1_c, bk1_c, wk2_c, bk2_c = _interleave_ws(
        wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, num_heads)
    cws = [(wq_c, bq_c), (wk1_c, bk1_c), (wk2_c, bk2_c)]
    vws = [(wv1, bv1), (wv2, bv2)]
    return _fp2_call_fwd(xq, x1, x2, cws, vws, mask_q, mask_1, mask_2,
                         dropout_rate, seed, deterministic, interpret,
                         scale, num_heads)


def _fp2_fwd_rule(xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                  wv1, bv1, wv2, bv2, mask_q, mask_1, mask_2,
                  dropout_rate, deterministic, interpret, scale, num_heads,
                  seed):
    out = _fused_proj_attention_v2(
        xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1,
        wv2, bv2, mask_q, mask_1, mask_2, dropout_rate, deterministic,
        interpret, scale, num_heads, seed)
    res = (xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1,
           wv2, bv2, mask_q, mask_1, mask_2, seed)
    return out, res


def _fp2_bwd_rule(dropout_rate, deterministic, interpret, scale, num_heads,
                  res, g):
    (xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, wv1, bv1, wv2,
     bv2, mask_q, mask_1, mask_2, seed) = res
    wq_c, bq_c, wk1_c, bk1_c, wk2_c, bk2_c = _interleave_ws(
        wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, num_heads)
    cws = [(wq_c, bq_c), (wk1_c, bk1_c), (wk2_c, bk2_c)]
    vws = [(wv1, bv1), (wv2, bv2)]
    dxq, dx1, dx2, dcws, dvws = _fp2_call_bwd(
        xq, x1, x2, cws, vws, mask_q, mask_1, mask_2, g, dropout_rate,
        seed, deterministic, interpret, scale, num_heads)
    (dwq_c, dbq_c), (dwk1_c, dbk1_c), (dwk2_c, dbk2_c) = dcws
    (dwv1, dbv1), (dwv2, dbv2) = dvws
    H = num_heads
    grads = [dxq, dx1, dx2,
             _deinterleave_w(dwq_c, H, 0).astype(wq1.dtype),
             _deinterleave_b(dbq_c, H, 0).astype(bq1.dtype),
             _deinterleave_w(dwq_c, H, 1).astype(wq2.dtype),
             _deinterleave_b(dbq_c, H, 1).astype(bq2.dtype),
             _deinterleave_w(dwk1_c, H, 0).astype(wk1.dtype),
             _deinterleave_b(dbk1_c, H, 0).astype(bk1.dtype),
             _deinterleave_w(dwk2_c, H, 1).astype(wk2.dtype),
             _deinterleave_b(dbk2_c, H, 1).astype(bk2.dtype),
             dwv1.astype(wv1.dtype), dbv1.astype(bv1.dtype),
             dwv2.astype(wv2.dtype), dbv2.astype(bv2.dtype)]
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    grads += [f0(mask_q), f0(mask_1), f0(mask_2), f0(seed)]
    return tuple(grads)


_fused_proj_attention_v2.defvjp(_fp2_fwd_rule, _fp2_bwd_rule)


# ---------------------------------------------------------------------------
# v3 backward for the projection-fused kernel: the round-2 bwd accumulates
# dW across the grid, which forces 'arbitrary' (sequential) grid semantics —
# and the round-3 microbenchmarks showed parallel grids are worth ~25% on
# the two-block bwd (8.95 vs ~12 ms). v3 keeps the fused fwd but the bwd
# kernel only emits the six per-block q/k/v gradients (block-local outputs,
# parallel-safe); the dx chains and the weight gradients become plain XLA
# matmuls over the full batch (x^T dy at (B*L, d) x (d, d) — shapes the MXU
# likes). Costs one ~190 MB HBM round trip of dq/dk/dv per invocation,
# buys parallel grid execution of the whole attention backward.
# A/B via SEGMM_ATTN_V3_BWD=1.
# ---------------------------------------------------------------------------

ATTN_V3_BWD = os.environ.get("SEGMM_ATTN_V3_BWD", "0") == "1"


def _fp3_bwd_kernel(seed_ref, xq_ref, x1_ref, x2_ref,
                    wq1_ref, bq1_ref, wq2_ref, bq2_ref,
                    wk1_ref, bk1_ref, wk2_ref, bk2_ref,
                    wv1_ref, bv1_ref, wv2_ref, bv2_ref,
                    mq_ref, mk1_ref, mk2_ref, g_ref,
                    dq1_ref, dq2_ref, dk1_ref, dk2_ref, dv1_ref, dv2_ref,
                    pq1, pq2, pk1, pk2, pv1, pv2, *,
                    num_heads, qk_dim, v_dim, scale, dropout_rate,
                    deterministic, interpret):
    b = pl.program_id(0)
    if not deterministic and dropout_rate > 0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + b)
    xq = xq_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    pq1[...] = _proj(xq, wq1_ref, bq1_ref)
    pq2[...] = _proj(xq, wq2_ref, bq2_ref)
    pk1[...] = _proj(x1, wk1_ref, bk1_ref)
    pk2[...] = _proj(x2, wk2_ref, bk2_ref)
    pv1[...] = _proj(x1, wv1_ref, bv1_ref)
    pv2[...] = _proj(x2, wv2_ref, bv2_ref)
    pair1 = (mq_ref[...][:, :, None] * mk1_ref[...][:, None, :]) > 0
    pair2 = (mq_ref[...][:, :, None] * mk2_ref[...][:, None, :]) > 0

    hpg = max(1, 128 // qk_dim)
    if num_heads % hpg != 0 or qk_dim * hpg != 128 or v_dim != qk_dim:
        hpg = num_heads

    def group_body(g, _):
        dqs = pl.dslice(g * hpg * qk_dim, hpg * qk_dim)
        dvs = pl.dslice(g * hpg * v_dim, hpg * v_dim)
        q1g, q2g = pq1[:, :, dqs], pq2[:, :, dqs]
        k1g, k2g = pk1[:, :, dqs], pk2[:, :, dqs]
        v1g, v2g = pv1[:, :, dvs], pv2[:, :, dvs]
        gg = g_ref[:, :, dvs].astype(jnp.float32)
        acc = {k: [] for k in ("dq1", "dq2", "dk1", "dk2", "dv1", "dv2")}
        for j in range(hpg):
            sl = slice(j * qk_dim, (j + 1) * qk_dim)
            sl_v = slice(j * v_dim, (j + 1) * v_dim)
            dims = (((2,), (2,)), ((0,), (0,)))
            q1_h, q2_h = q1g[:, :, sl], q2g[:, :, sl]
            k1_h, k2_h = k1g[:, :, sl], k2g[:, :, sl]
            v1_h, v2_h = v1g[:, :, sl_v], v2g[:, :, sl_v]
            g_h = gg[:, :, sl_v]
            l1 = jax.lax.dot_general(q1_h, k1_h, dims,
                                     preferred_element_type=jnp.float32)
            l2 = jax.lax.dot_general(q2_h, k2_h, dims,
                                     preferred_element_type=jnp.float32)
            # same PRNG stream as the forward: same seed, same draw order
            p1, p2, keep1, keep2 = _joint_probs(
                l1, l2, pair1, pair2, scale, dropout_rate, deterministic,
                interpret, seed_ref[0] + b, g * hpg + j)

            pt = (((1,), (1,)), ((0,), (0,)))
            acc["dv1"].append(jax.lax.dot_general(
                p1, g_h, pt, preferred_element_type=jnp.float32))
            acc["dv2"].append(jax.lax.dot_general(
                p2, g_h, pt, preferred_element_type=jnp.float32))
            dp1 = jax.lax.dot_general(g_h, v1_h.astype(jnp.float32), dims,
                                      preferred_element_type=jnp.float32)
            dp2 = jax.lax.dot_general(g_h, v2_h.astype(jnp.float32), dims,
                                      preferred_element_type=jnp.float32)
            ssum = (dp1 * p1).sum(-1, keepdims=True) \
                + (dp2 * p2).sum(-1, keepdims=True)
            dl1 = p1 * (dp1 - ssum) * scale
            dl2 = p2 * (dp2 - ssum) * scale
            if not deterministic and dropout_rate > 0:
                dl1 = jnp.where(keep1, dl1 / (1.0 - dropout_rate), 0.0)
                dl2 = jnp.where(keep2, dl2 / (1.0 - dropout_rate), 0.0)
            dl1 = jnp.where(pair1, dl1, 0.0)
            dl2 = jnp.where(pair2, dl2, 0.0)
            qk = (((2,), (1,)), ((0,), (0,)))
            acc["dq1"].append(jax.lax.dot_general(
                dl1, k1_h.astype(jnp.float32), qk,
                preferred_element_type=jnp.float32))
            acc["dq2"].append(jax.lax.dot_general(
                dl2, k2_h.astype(jnp.float32), qk,
                preferred_element_type=jnp.float32))
            acc["dk1"].append(jax.lax.dot_general(
                dl1, q1_h.astype(jnp.float32), pt,
                preferred_element_type=jnp.float32))
            acc["dk2"].append(jax.lax.dot_general(
                dl2, q2_h.astype(jnp.float32), pt,
                preferred_element_type=jnp.float32))
        cat = lambda xs: jnp.concatenate(xs, axis=-1) if hpg > 1 else xs[0]
        dq1_ref[:, :, dqs] = cat(acc["dq1"]).astype(dq1_ref.dtype)
        dq2_ref[:, :, dqs] = cat(acc["dq2"]).astype(dq2_ref.dtype)
        dk1_ref[:, :, dqs] = cat(acc["dk1"]).astype(dk1_ref.dtype)
        dk2_ref[:, :, dqs] = cat(acc["dk2"]).astype(dk2_ref.dtype)
        dv1_ref[:, :, dvs] = cat(acc["dv1"]).astype(dv1_ref.dtype)
        dv2_ref[:, :, dvs] = cat(acc["dv2"]).astype(dv2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_heads // hpg, group_body, 0)


def _fp3_call_bwd(xq, x1, x2, ws, mask_q, mask_1, mask_2, g,
                  dropout_rate, seed, deterministic, interpret, scale,
                  num_heads):
    """Parallel-grid qkv-grad kernel + XLA chains for dx and dW."""
    B, Lq, d = xq.shape
    L1, L2 = x1.shape[1], x2.shape[1]
    H = num_heads
    Dh = d // H
    bt = _pick_block_b(B)
    b3 = lambda L: pl.BlockSpec((bt, L, d), lambda i, *_: (i, 0, 0))
    b2 = lambda L: pl.BlockSpec((bt, L), lambda i, *_: (i, 0))
    w_spec = pl.BlockSpec((d, d), lambda i, *_: (0, 0))
    bias_spec = pl.BlockSpec((1, d), lambda i, *_: (0, 0))
    kernel = functools.partial(_fp3_bwd_kernel, num_heads=H, qk_dim=Dh,
                               v_dim=Dh, scale=scale,
                               dropout_rate=dropout_rate,
                               deterministic=deterministic,
                               interpret=interpret)
    in_specs = [b3(Lq), b3(L1), b3(L2)]
    for _ in range(6):
        in_specs += [w_spec, bias_spec]
    in_specs += [b2(Lq), b2(L1), b2(L2), b3(Lq)]
    out_specs = [b3(Lq), b3(Lq), b3(L1), b3(L2), b3(L1), b3(L2)]
    out_shapes = [jax.ShapeDtypeStruct((B, Lq, d), jnp.float32),
                  jax.ShapeDtypeStruct((B, Lq, d), jnp.float32),
                  jax.ShapeDtypeStruct((B, L1, d), jnp.float32),
                  jax.ShapeDtypeStruct((B, L2, d), jnp.float32),
                  jax.ShapeDtypeStruct((B, L1, d), jnp.float32),
                  jax.ShapeDtypeStruct((B, L2, d), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // bt,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, Lq, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype),
                        pltpu.VMEM((bt, L1, d), xq.dtype),
                        pltpu.VMEM((bt, L2, d), xq.dtype)])
    flat_ws = []
    for w, bias in ws:
        flat_ws += [w, bias.reshape(1, d)]
    dq1, dq2, dk1, dk2, dv1, dv2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(seed, xq, x1, x2, *flat_ws,
      mask_q.astype(jnp.int32), mask_1.astype(jnp.int32),
      mask_2.astype(jnp.int32), g)

    # XLA chains: dx through the projections, dW/db over the full batch
    (wq1, bq1), (wq2, bq2), (wk1, bk1), (wk2, bk2), (wv1, bv1), \
        (wv2, bv2) = ws

    def chain(dy, w):
        return jnp.einsum("bld,ed->ble", dy,
                          w.astype(jnp.float32))

    dxq = (chain(dq1, wq1) + chain(dq2, wq2)).astype(xq.dtype)
    dx1 = (chain(dk1, wk1) + chain(dv1, wv1)).astype(x1.dtype)
    dx2 = (chain(dk2, wk2) + chain(dv2, wv2)).astype(x2.dtype)

    def wgrad(x, dy):
        xf = x.reshape(-1, d).astype(jnp.float32)
        dyf = dy.reshape(-1, d)
        return xf.T @ dyf, dyf.sum(0)

    dws = [wgrad(xq, dq1), wgrad(xq, dq2), wgrad(x1, dk1), wgrad(x2, dk2),
           wgrad(x1, dv1), wgrad(x2, dv2)]
    return dxq, dx1, dx2, dws
