"""SegFormerX — the dual-stream (user x video) segment transformer.

Behavioral spec: /root/reference/MMinterest/models/encoder.py (SegFormerX,
SegFormerXEncoder, SegFormerXEncoderLayer, SegFormerXAttention). This is a
TPU-first re-design, not a translation:

* All shapes are static: video is always (B, Lv=40) segments, user is
  (B, Lu<=100) segments or (B, 1) id tokens; padding is mask-aware.
* The four attention streams (v2v, t2v, v2t, t2t) are expressed as two
  concat-KV attentions whose matmuls XLA tiles directly onto the MXU.
* All experiments in the reference run with sr_ratio=1 and
  use_patch_merge=False (main_for_seq_leave_earlystop_SegMM.py:94); the
  uniform-width stack is the hot path (fused Pallas attention). The conv
  pyramid (sr_ratio_lvls / use_patch_merge) IS supported for capability
  parity, on the unfused XLA attention path, plus a working SegFormerXFPN
  (the reference's FPN class is unrunnable version skew — see PARITY M2).

Faithful quirks (kept deliberately, documented in PARITY.md):
* Attention logits are mask-filled with -10000.0 *before* the 1/sqrt(d_head)
  scaling (encoder.py:71 then :117,146).
* Dropout is applied to attention *logits*, not probabilities (encoder.py:116).
* ``output_layers=[-1]`` selects the *input* of the last encoder layer
  (encoder.py:316-319): intermediate_states[i] is the input to layer i, so the
  final layer's video output is discarded by the reference. We therefore only
  run the layers whose outputs are observable — identical math, less compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.numerics import MASK_FILL_VALUE, masked_attention_logits

# Reference init: every Linear/Embedding weight ~ N(0, 0.02), biases zero
# (encoder.py:414-423).
DENSE_INIT = nn.initializers.normal(stddev=0.02)
LN_EPS = 1e-12


class KnMLP(nn.Module):
    """n-layer MLP with activation+dropout between layers, none after the last
    (kn_util/nn_utils/layers/mlp.py:1-24)."""
    dims: Sequence[int]
    activation: str = "gelu"
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        # torch F.gelu (mlp.py get_activation_fn) is the exact erf form;
        # flax nn.gelu defaults to the tanh approximation — use exact
        act = {"relu": nn.relu,
               "gelu": partial(nn.gelu, approximate=False)}[self.activation]
        n = len(self.dims) - 1
        for i in range(n):
            x = nn.Dense(self.dims[i + 1], kernel_init=DENSE_INIT,
                         dtype=self.dtype, name=f"layer_{i}")(x)
            if i != n - 1:
                x = act(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MLPBlock(nn.Module):
    """FuxiCTR-style MLP block used by the CrossMLP/SelfMLP ablations and the
    SegRec backbones (encoder.py:210-252). ReLU, optional norms, output head."""
    input_dim: int
    hidden_units: Sequence[int]
    output_dim: Optional[int] = None
    dropout: float = 0.0
    batch_norm: bool = False
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        for i, h in enumerate(self.hidden_units):
            x = nn.Dense(h, kernel_init=DENSE_INIT, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.layer_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, kernel_init=DENSE_INIT,
                         dtype=self.dtype, name="dense_out")(x)
        return x


class _ProjParams(nn.Module):
    """Declares kernel/bias with nn.Dense-compatible param paths, for use by
    the projection-fused attention kernel (checkpoints stay interchangeable
    with the unfused path)."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", DENSE_INIT, (self.in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return k, b


class _LNParams(nn.Module):
    """Declares scale/bias with nn.LayerNorm-compatible param paths (for the
    layer-fused kernel path; checkpoints stay interchangeable)."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _FLMLPParams(nn.Module):
    """KnMLP([d, ff, d]) parameter mirror (layer_0/layer_1 Dense paths)."""
    d: int
    ff: int

    @nn.compact
    def __call__(self):
        return (_ProjParams(self.d, self.ff, name="layer_0")()
                + _ProjParams(self.ff, self.d, name="layer_1")())


class _FLAttnParams(nn.Module):
    """FourStreamAttention parameter mirror for the layer-fused kernel path:
    the 12 QKV projections, the two out-projections and the two
    attention-level LayerNorms, with paths identical to the composed
    modules."""
    d: int

    @nn.compact
    def __call__(self):
        out = {}
        for s in ("t2v", "v2v", "t2t", "v2t"):
            out[s] = [_ProjParams(self.d, self.d, name=f"{s}_proj_{i}")()
                      for i in range(3)]
        out["ff_usr"] = _ProjParams(self.d, self.d, name="ff_usr")()
        out["ff_vid"] = _ProjParams(self.d, self.d, name="ff_vid")()
        out["ln_vid"] = _LNParams(self.d, name="ln_vid")()
        out["ln_usr"] = _LNParams(self.d, name="ln_usr")()
        return out


class FourStreamAttention(nn.Module):
    """v2v / t2v / v2t / t2t attention with per-stream QKV projections and
    concatenated KV for the user<->video cross streams (encoder.py:12-175).

    With ``fused=True`` the mask-fill/dropout/scale/softmax/AV chain runs in
    the Pallas kernel (core/attention.py); the per-stream q projections are
    handled by concatenating the two q projections along the head dim and
    zero-padding each key block's complementary half, so one kernel call
    computes the jointly-normalized concat-KV softmax exactly.
    """
    d_model: int
    num_heads: int
    dropout: float = 0.1
    ablation: str = "ours"
    dtype: Any = jnp.float32
    fused: bool = False
    interpret: bool = False  # route the kernel through the interpreter (tests)
    # horizontal fusion: the 6 per-stream projections of each input stream
    # become one wide Dense (identical init distribution, one HBM read of
    # the activations instead of six)
    fuse_projections: bool = False
    # run the 12 QKV projections INSIDE the attention kernel: q/k/v and
    # dq/dk/dv never materialize in HBM (the memory-bound step's largest
    # traffic term). Parameter tree identical to the unfused path.
    fuse_qkv: bool = False
    # merge BOTH per-layer stream calls into ONE Pallas invocation
    # (core/dual_kernel.py): half the invocations of fuse_qkv, epilogue
    # matmuls stay in XLA (unlike fuse_layer). Implies fuse_qkv semantics;
    # parameter tree identical. Degenerate single-query streams fall back
    # to the two-call path (which routes them to XLA, version=0).
    fuse_dual: bool = False
    # conv down-sampling of the VIDEO K/V source (encoder.py:23-31,84-93):
    # Conv1d(d, d, kernel=sr, stride=sr, pad=(sr-1)//2) over the sequence,
    # mask via MaxPool1d(sr, sr). Disabled (1) in every published run
    # (main_…SegMM.py:94); supported on the unfused path only.
    sr_ratio: int = 1

    def _split_heads(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, self.d_model // self.num_heads)

    @nn.compact
    def __call__(self, vid_feat, vid_mask, usr_feat, usr_mask,
                 deterministic: bool = True):
        d = self.d_model
        dh = d // self.num_heads

        drop = nn.Dropout(self.dropout)
        if self.sr_ratio > 1 and self.fused:
            raise ValueError(
                "sr_ratio > 1 changes the video K/V length per layer and is "
                "only supported on the unfused (XLA) attention path")

        # ---- sr_ratio conv down-sampling of the video K/V source ----
        # (encoder.py:86-96): K/V come from the conv-strided sequence, the
        # key mask from MaxPool1d(sr, sr); queries keep full resolution.
        # The pooled window mixes padded positions into valid keys — a
        # reference behavior, kept (PARITY M2).
        vid_kv, vid_kv_mask = vid_feat, vid_mask
        if self.sr_ratio > 1:
            sr = self.sr_ratio
            pad = (sr - 1) // 2
            vid_kv = nn.Conv(
                features=d, kernel_size=(sr,), strides=(sr,),
                padding=[(pad, pad)], kernel_init=DENSE_INIT,
                dtype=self.dtype, name="sr")(vid_feat)
            n_sr = vid_mask.shape[1] // sr
            if vid_kv.shape[1] != n_sr:
                # torch's Conv1d and MaxPool1d disagree on the output length
                # for this (L, sr) pair — the reference itself cannot run it
                raise ValueError(
                    f"sr_ratio={sr} over Lv={vid_mask.shape[1]}: conv gives "
                    f"{vid_kv.shape[1]} keys but the mask pool gives {n_sr}")
            vid_kv_mask = vid_mask[:, :n_sr * sr].reshape(
                vid_mask.shape[0], n_sr, sr).any(axis=-1)

        ours_path = ("CrossAtt" not in self.ablation
                     and "SelfAtt" not in self.ablation)
        if (self.fused and (self.fuse_qkv or self.fuse_dual) and ours_path):
            # dispatch BEFORE the nn.Dense projections exist — the fused-QKV
            # paths declare the same parameter names themselves
            return self._fused_qkv_forward(vid_feat, vid_mask, usr_feat,
                                           usr_mask, drop, deterministic)

        def proj(name):
            # clones(nn.Linear, 3) -> q/k/v projections (encoder.py:17-20)
            return [nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                             name=f"{name}_{i}")
                    for i in range(3)]

        t2v = proj("t2v_proj")
        v2v = proj("v2v_proj")
        t2t = proj("t2t_proj")
        v2t = proj("v2t_proj")

        def attn_logits(feat_k, mask_k, feat_q, mask_q, p):
            q = self._split_heads(p[0](feat_q))
            k = self._split_heads(p[1](feat_k))
            return masked_attention_logits(q, k, mask_q, mask_k)

        # with fuse_projections the 'ours' fused path sources everything from
        # the two wide Denses — don't create the per-stream params at all
        wide = (self.fused and self.fuse_projections and ours_path)
        if wide:
            v2v_value = t2v_value = v2t_value = t2t_value = None
        else:
            v2v_value = self._split_heads(v2v[2](vid_kv))
            t2v_value = self._split_heads(t2v[2](usr_feat))
            v2t_value = self._split_heads(v2t[2](vid_kv))
            t2t_value = self._split_heads(t2t[2](usr_feat))

        if self.fused:
            return self._fused_forward(
                vid_feat, vid_mask, usr_feat, usr_mask,
                v2v, t2v, v2t, t2t,
                v2v_value, t2v_value, v2t_value, t2t_value, drop,
                deterministic)

        if "CrossAtt" in self.ablation:
            v_logits = attn_logits(usr_feat, usr_mask, vid_feat, vid_mask, t2v)
            t_logits = attn_logits(vid_kv, vid_kv_mask, usr_feat, usr_mask,
                                   v2t)
            v_value, t_value = t2v_value, v2t_value
        elif "SelfAtt" in self.ablation:
            v_logits = attn_logits(vid_kv, vid_kv_mask, vid_feat, vid_mask,
                                   v2v)
            t_logits = attn_logits(usr_feat, usr_mask, usr_feat, usr_mask, t2t)
            v_value, t_value = v2v_value, t2t_value
        else:
            v2v_l = attn_logits(vid_kv, vid_kv_mask, vid_feat, vid_mask, v2v)
            t2v_l = attn_logits(usr_feat, usr_mask, vid_feat, vid_mask, t2v)
            v2t_l = attn_logits(vid_kv, vid_kv_mask, usr_feat, usr_mask, v2t)
            t2t_l = attn_logits(usr_feat, usr_mask, usr_feat, usr_mask, t2t)
            v_logits = jnp.concatenate([v2v_l, t2v_l], axis=-1)
            t_logits = jnp.concatenate([v2t_l, t2t_l], axis=-1)
            v_value = jnp.concatenate([v2v_value, t2v_value], axis=1)
            t_value = jnp.concatenate([v2t_value, t2t_value], axis=1)

        # dropout on logits, then scale, then softmax (encoder.py:116-150);
        # softmax reduces in fp32 for bf16 stability, probs cast back for AV
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        v_probs = jax.nn.softmax(
            drop(v_logits, deterministic=deterministic).astype(jnp.float32)
            * scale, axis=-1).astype(self.dtype)
        t_probs = jax.nn.softmax(
            drop(t_logits, deterministic=deterministic).astype(jnp.float32)
            * scale, axis=-1).astype(self.dtype)

        vid_out = jnp.einsum("bhqk,bkhd->bqhd", v_probs, v_value)
        usr_out = jnp.einsum("bhqk,bkhd->bqhd", t_probs, t_value)
        b = vid_feat.shape[0]
        vid_out = vid_out.reshape(b, vid_feat.shape[1], d)
        usr_out = usr_out.reshape(b, usr_feat.shape[1], d)

        usr_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_usr")(usr_out),
                       deterministic=deterministic)
        vid_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_vid")(vid_out),
                       deterministic=deterministic)

        vid_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_vid")(vid_feat + vid_out)
        if "SelfAtt" in self.ablation:
            return vid_feat, None
        usr_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_usr")(usr_feat + usr_out)
        return vid_feat, usr_feat

    def _fused_qkv_forward(self, vid_feat, vid_mask, usr_feat, usr_mask,
                           drop, deterministic):
        """'ours' path with all 12 QKV projections inside the Pallas kernel
        (core/attention.py:fused_proj_two_block_attention)."""
        import math

        from ..core.attention import fused_proj_two_block_attention
        d = self.d_model
        scale = 1.0 / math.sqrt(d // self.num_heads)
        rate = self.dropout if not deterministic else 0.0
        if rate > 0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (2,), 0, 2 ** 31 - 1, jnp.int32)
        else:
            seed = jnp.zeros((2,), jnp.int32)

        def projs(name):
            return [_ProjParams(d, d, name=f"{name}_{i}")() for i in range(3)]

        t2v = projs("t2v_proj")
        v2v = projs("v2v_proj")
        t2t = projs("t2t_proj")
        v2t = projs("v2t_proj")

        def cast(p):
            return (p[0].astype(self.dtype), p[1].astype(self.dtype))

        def call(xq, x1, x2, pq1, pq2, pk1, pk2, pv1, pv2, mq, m1, m2, slot):
            (wq1, bq1), (wq2, bq2) = cast(pq1), cast(pq2)
            (wk1, bk1), (wk2, bk2) = cast(pk1), cast(pk2)
            (wv1, bv1), (wv2, bv2) = cast(pv1), cast(pv2)
            # degenerate single-query streams (the ID backbone's usr stream,
            # max_usr_len=1) go through the composed XLA path: the Pallas
            # grid's per-step fixed overhead exceeds the whole materialized
            # computation there (measured 5.1 vs 1.9 ms fwd+bwd,
            # kernel_bench r3)
            version = 0 if (xq.shape[1] == 1 and not self.interpret) else None
            return fused_proj_two_block_attention(
                xq, x1, x2, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                wv1, bv1, wv2, bv2, mq, m1, m2, num_heads=self.num_heads,
                dropout_rate=rate, seed=seed[slot],
                deterministic=deterministic, interpret=self.interpret,
                scale=scale, version=version)

        # vid stream: block1 = v2v (q,k,v of vid), block2 = t2v (q of vid,
        # k/v of usr); usr stream: block1 = v2t (q of usr, k/v of vid),
        # block2 = t2t (q,k,v of usr) — same wiring as _fused_forward
        dual = (self.fuse_dual
                and vid_feat.shape[1] > 1 and usr_feat.shape[1] > 1)
        if dual:
            # both streams in ONE kernel invocation (core/dual_kernel.py);
            # one PRNG seed covers both streams' draws
            from ..core.dual_kernel import fused_dual_stream_attention
            qkv = lambda pq1, pq2, pk1, pk2, pv1, pv2: tuple(
                cast(p) for p in (pq1, pq2, pk1, pk2, pv1, pv2))
            vid_out, usr_out = fused_dual_stream_attention(
                vid_feat, usr_feat,
                qkv(v2v[0], t2v[0], v2v[1], t2v[1], v2v[2], t2v[2]),
                qkv(v2t[0], t2t[0], v2t[1], t2t[1], v2t[2], t2t[2]),
                vid_mask, usr_mask, num_heads=self.num_heads,
                dropout_rate=rate, seed=seed[0], deterministic=deterministic,
                interpret=self.interpret, scale=scale)
        else:
            vid_out = call(vid_feat, vid_feat, usr_feat,
                           v2v[0], t2v[0], v2v[1], t2v[1], v2v[2], t2v[2],
                           vid_mask, vid_mask, usr_mask, 0)
            usr_out = call(usr_feat, vid_feat, usr_feat,
                           v2t[0], t2t[0], v2t[1], t2t[1], v2t[2], t2t[2],
                           usr_mask, vid_mask, usr_mask, 1)

        usr_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_usr")(usr_out),
                       deterministic=deterministic)
        vid_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_vid")(vid_out),
                       deterministic=deterministic)
        vid_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_vid")(vid_feat + vid_out)
        usr_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_usr")(usr_feat + usr_out)
        return vid_feat, usr_feat

    def _fused_forward(self, vid_feat, vid_mask, usr_feat, usr_mask,
                       v2v, t2v, v2t, t2t,
                       v2v_value, t2v_value, v2t_value, t2t_value, drop,
                       deterministic):
        import math

        from ..core.attention import fused_masked_attention
        d = self.d_model
        dh = d // self.num_heads
        scale = 1.0 / math.sqrt(dh)
        sh = self._split_heads
        B = vid_feat.shape[0]
        rate = self.dropout if not deterministic else 0.0
        if rate > 0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (2,), 0, 2 ** 31 - 1, jnp.int32)
        else:
            seed = jnp.zeros((2,), jnp.int32)

        def fused(q, k, v, mq, mk, seed_slot):
            return fused_masked_attention(
                q, k, v, mq, mk, dropout_rate=rate, seed=seed[seed_slot],
                deterministic=deterministic, interpret=self.interpret,
                scale=scale)

        if "CrossAtt" in self.ablation:
            vid_out = fused(sh(t2v[0](vid_feat)), sh(t2v[1](usr_feat)),
                            t2v_value, vid_mask, usr_mask, 0)
            usr_out = fused(sh(v2t[0](usr_feat)), sh(v2t[1](vid_feat)),
                            v2t_value, usr_mask, vid_mask, 1)
        elif "SelfAtt" in self.ablation:
            vid_out = fused(sh(v2v[0](vid_feat)), sh(v2v[1](vid_feat)),
                            v2v_value, vid_mask, vid_mask, 0)
            usr_out = fused(sh(t2t[0](usr_feat)), sh(t2t[1](usr_feat)),
                            t2t_value, usr_mask, usr_mask, 1)
        else:
            # two-block fused path: per-block q projections, one joint
            # softmax; the custom VJP saves the unconcatenated halves
            from ..core.attention import fused_two_block_attention

            def fused2(qa, qb, ka, kb, va, vb, mq, slot):
                return fused_two_block_attention(
                    qa, qb, ka, kb, va, vb, mq, vid_mask, usr_mask,
                    dropout_rate=rate, seed=seed[slot],
                    deterministic=deterministic, interpret=self.interpret,
                    scale=scale)

            if self.fuse_projections:
                vid_all = nn.Dense(6 * d, kernel_init=DENSE_INIT,
                                   dtype=self.dtype,
                                   name="vid_projs")(vid_feat)
                usr_all = nn.Dense(6 * d, kernel_init=DENSE_INIT,
                                   dtype=self.dtype,
                                   name="usr_projs")(usr_feat)
                (q_v2v, k_v2v, vv_v2v, q_t2v, k_v2t, vv_v2t) = [
                    sh(vid_all[..., j * d:(j + 1) * d]) for j in range(6)]
                (k_t2v, vv_t2v, q_v2t, q_t2t, k_t2t, vv_t2t) = [
                    sh(usr_all[..., j * d:(j + 1) * d]) for j in range(6)]
                vid_out = fused2(q_v2v, q_t2v, k_v2v, k_t2v,
                                 vv_v2v, vv_t2v, vid_mask, 0)
                usr_out = fused2(q_v2t, q_t2t, k_v2t, k_t2t,
                                 vv_v2t, vv_t2t, usr_mask, 1)
            else:
                vid_out = fused2(sh(v2v[0](vid_feat)), sh(t2v[0](vid_feat)),
                                 sh(v2v[1](vid_feat)), sh(t2v[1](usr_feat)),
                                 v2v_value, t2v_value, vid_mask, 0)
                usr_out = fused2(sh(v2t[0](usr_feat)), sh(t2t[0](usr_feat)),
                                 sh(v2t[1](vid_feat)), sh(t2t[1](usr_feat)),
                                 v2t_value, t2t_value, usr_mask, 1)

        vid_out = vid_out.reshape(B, vid_feat.shape[1], d)
        usr_out = usr_out.reshape(B, usr_feat.shape[1], d)
        usr_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_usr")(usr_out),
                       deterministic=deterministic)
        vid_out = drop(nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                                name="ff_vid")(vid_out),
                       deterministic=deterministic)
        vid_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_vid")(vid_feat + vid_out)
        if "SelfAtt" in self.ablation:
            return vid_feat, None
        usr_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_usr")(usr_feat + usr_out)
        return vid_feat, usr_feat


class SegFormerXLayer(nn.Module):
    """Attention + per-stream GELU MLP FFN with post-LN residuals
    (encoder.py:178-208)."""
    d_model: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    ablation: str = "ours"
    dtype: Any = jnp.float32
    fused: bool = False
    interpret: bool = False
    fuse_projections: bool = False
    fuse_qkv: bool = False
    # both stream calls in ONE kernel invocation (core/dual_kernel.py)
    fuse_dual: bool = False
    sr_ratio: int = 1
    # 'attention' remat scope: recompute only the projections+attention block
    # on backward (its 12 projection outputs dominate live activations; the
    # FFN hiddens stay saved, so backward re-runs ~60% of a layer instead of
    # 100% as whole-layer remat does)
    remat_attention: bool = False
    # run the ENTIRE layer stream (attention + out-proj + LN residual +
    # GELU MLP + LN residual) in one Pallas kernel per stream
    # (core/layer_kernel.py): the per-layer XLA matmul chains fold into the
    # latency-bound kernel invocation and only the layer INPUTS are saved
    # for backward (flash-style in-kernel recompute) — remat becomes
    # unnecessary. Parameter tree identical to the composed path.
    fuse_layer: bool = False

    @nn.compact
    def __call__(self, usr_feat, usr_mask, vid_feat, vid_mask,
                 deterministic: bool):
        ours_path = ("CrossAtt" not in self.ablation
                     and "SelfAtt" not in self.ablation)
        if self.fuse_layer and ours_path and self.sr_ratio == 1:
            return self._fused_layer_forward(usr_feat, usr_mask, vid_feat,
                                             vid_mask, deterministic)
        attn_cls = (nn.remat(FourStreamAttention, static_argnums=(5,))
                    if self.remat_attention else FourStreamAttention)
        attn = attn_cls(
            d_model=self.d_model, num_heads=self.num_heads,
            dropout=self.dropout, ablation=self.ablation, dtype=self.dtype,
            fused=self.fused, interpret=self.interpret,
            fuse_projections=self.fuse_projections,
            fuse_qkv=self.fuse_qkv, fuse_dual=self.fuse_dual,
            sr_ratio=self.sr_ratio,
            name="cross_attn")
        if self.remat_attention:
            vid_feat, usr_feat = attn(vid_feat, vid_mask, usr_feat, usr_mask,
                                      deterministic)
        else:
            vid_feat, usr_feat = attn(vid_feat, vid_mask, usr_feat, usr_mask,
                                      deterministic=deterministic)
        drop = nn.Dropout(self.dropout)
        ff_vid = KnMLP([self.d_model, self.ff_dim, self.d_model],
                       activation="gelu", dropout=self.dropout,
                       dtype=self.dtype, name="ff_vid")
        vid_new = drop(ff_vid(vid_feat, deterministic=deterministic),
                       deterministic=deterministic)
        vid_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_vid")(vid_feat + vid_new)
        if usr_feat is not None:
            ff_usr = KnMLP([self.d_model, self.ff_dim, self.d_model],
                           activation="gelu", dropout=self.dropout,
                           dtype=self.dtype, name="ff_usr")
            usr_new = drop(ff_usr(usr_feat, deterministic=deterministic),
                           deterministic=deterministic)
            usr_feat = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_usr")(usr_feat + usr_new)
        return vid_feat, usr_feat

    def _fused_layer_forward(self, usr_feat, usr_mask, vid_feat, vid_mask,
                             deterministic):
        """'ours' path with the whole layer in one Pallas kernel per stream
        (core/layer_kernel.py:fused_layer_stream). Same stream wiring as
        FourStreamAttention._fused_qkv_forward: vid stream block1 = v2v,
        block2 = t2v; usr stream block1 = v2t, block2 = t2t."""
        import math

        from ..core.layer_kernel import fused_layer_stream
        d = self.d_model
        scale = 1.0 / math.sqrt(d // self.num_heads)
        rate = self.dropout if not deterministic else 0.0
        if rate > 0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (2,), 0, 2 ** 31 - 1, jnp.int32)
        else:
            seed = jnp.zeros((2,), jnp.int32)

        ap = _FLAttnParams(d, name="cross_attn")()
        mlp_vid = _FLMLPParams(d, self.ff_dim, name="ff_vid")()
        mlp_usr = _FLMLPParams(d, self.ff_dim, name="ff_usr")()
        ln2_vid = _LNParams(d, name="ln_vid")()
        ln2_usr = _LNParams(d, name="ln_usr")()

        dt = self.dtype
        cast = lambda p: (p[0].astype(dt), p[1].astype(dt))  # noqa: E731

        def ep(ff_p, ln1, mlp, ln2):
            w0, b0, w1, b1 = mlp
            wf, bf = cast(ff_p)
            # LN scale/bias stay fp32 — the kernel normalizes in fp32
            return (wf, bf, ln1[0], ln1[1], w0.astype(dt), b0.astype(dt),
                    w1.astype(dt), b1.astype(dt), ln2[0], ln2[1])

        def qkv(*ps):
            return tuple(cast(p) for p in ps)

        def call(xq, x1, x2, blocks, epilogue, mq, m1, m2, slot):
            return fused_layer_stream(
                xq, x1, x2, blocks, epilogue, mq, m1, m2,
                num_heads=self.num_heads, dropout_rate=rate,
                seed=seed[slot], deterministic=deterministic,
                interpret=self.interpret, scale=scale)

        vid_out = call(
            vid_feat, vid_feat, usr_feat,
            qkv(ap["v2v"][0], ap["t2v"][0], ap["v2v"][1], ap["t2v"][1],
                ap["v2v"][2], ap["t2v"][2]),
            ep(ap["ff_vid"], ap["ln_vid"], mlp_vid, ln2_vid),
            vid_mask, vid_mask, usr_mask, 0)
        usr_out = call(
            usr_feat, vid_feat, usr_feat,
            qkv(ap["v2t"][0], ap["t2t"][0], ap["v2t"][1], ap["t2t"][1],
                ap["v2t"][2], ap["t2t"][2]),
            ep(ap["ff_usr"], ap["ln_usr"], mlp_usr, ln2_usr),
            usr_mask, vid_mask, usr_mask, 1)
        return vid_out, usr_out


def _adaptive_avg_pool_seq(x: jax.Array, out_len: int) -> jax.Array:
    """torch AdaptiveAvgPool1d over the sequence axis of (B, L, D).

    Window i averages positions [floor(i*L/out), ceil((i+1)*L/out)). Static
    shapes, so the gather matrix is a compile-time constant.
    """
    L = x.shape[1]
    import numpy as np
    w = np.zeros((out_len, L), dtype=np.float32)
    for i in range(out_len):
        s = (i * L) // out_len
        e = -((-(i + 1) * L) // out_len)  # ceil
        w[i, s:e] = 1.0 / (e - s)
    return jnp.einsum("ol,bld->bod", jnp.asarray(w, x.dtype), x)


class SegFormerX(nn.Module):
    """The full encoder: input projections (+PE, LN, dropout), N dual-stream
    layers, ablation paths (encoder.py:327-520).

    Input modes (resolved by array rank, like the reference):
      video:  (B, Lv, Dv) float features     -> Dense(Dv -> d)
              (B,) or (B, Lv) int ids        -> Embed(d/2) ++ Dense(pos -> d/2)
      user:   (B, Lu, Du) float features     -> Dense(Du -> d)
              (B,) or (B, Lu) int ids        -> Embed(d)   (mask forced to ones
                                                for the (B,) -> (B,1) case)
    """
    d_model: int
    num_heads: int
    num_layers: int
    ff_dim: int
    max_vid_len: int = 40
    max_usr_len: int = 100
    dropout: float = 0.1
    user_id_max: int = -1    # -1 => user input is features
    video_id_max: int = -1   # -1 => video input is features
    use_pe: bool = True
    ablation: str = "ours"
    output_layers: Optional[Sequence[int]] = None  # default [-1] like drivers
    dtype: Any = jnp.float32
    # rematerialize each encoder layer on backward: the four attention
    # streams' (B, H, Lq, Lk) logit tensors dominate HBM at production batch
    # sizes; recomputing them costs ~1/3 extra FLOPs and cuts live activation
    # memory to ~one layer
    remat: bool = False
    # 'layer' recomputes the whole layer on backward; 'attention' recomputes
    # only the projections+attention block (FFN activations stay live)
    remat_scope: str = "layer"
    # run the mask/dropout/softmax/AV chain in the fused Pallas kernel
    fused_attention: bool = False
    interpret: bool = False
    # horizontally fuse the 12 per-stream QKV Denses into 2 wide ones
    # (same init distribution; one activation read instead of six)
    fuse_projections: bool = False
    # QKV projections inside the attention kernel (see FourStreamAttention)
    fuse_qkv: bool = False
    # both stream calls in ONE kernel invocation (see FourStreamAttention)
    fuse_dual: bool = False
    # whole layer (attention + FFN epilogue) in one Pallas kernel per stream
    # with flash-style backward recompute (see SegFormerXLayer.fuse_layer);
    # supersedes fused_attention/fuse_qkv on the 'ours' path
    fuse_layer: bool = False
    # per-layer conv pyramid (encoder.py:23-31,279-300): sr_ratio_lvls[i] > 1
    # conv-downsamples layer i's video K/V source; use_patch_merge[i] halves
    # the video sequence before layer i (Conv1d k3 s2 p1, mask any-pooled,
    # PE avg-pooled and re-added through pe_ln_{i}). Every published run
    # disables both (main_…SegMM.py:94); supported here for capability
    # parity, on the unfused attention path only.
    sr_ratio_lvls: Optional[Sequence[int]] = None
    use_patch_merge: Optional[Sequence[bool]] = None

    @nn.compact
    def __call__(self, usr_feat, usr_mask, vid_feat, vid_mask, *,
                 deterministic: bool = True):
        d = self.d_model
        drop = nn.Dropout(self.dropout)

        # ---- normalize input ranks (encoder.py:478-488) ----
        if usr_feat.ndim == 1:
            usr_feat = usr_feat[:, None]
            usr_mask = jnp.ones(usr_feat.shape[:2], dtype=bool)
        if vid_feat.ndim == 1:
            vid_feat = jnp.tile(vid_feat[:, None], (1, self.max_vid_len))
        usr_mask = usr_mask.astype(bool)
        vid_mask = vid_mask.astype(bool)
        B = vid_feat.shape[0]
        Lv = vid_feat.shape[1]

        # ---- input projections (encoder.py:352-362,425-445) ----
        if self.video_id_max >= 0:
            vid_emb = nn.Embed(self.video_id_max + 1, d // 2,
                               embedding_init=DENSE_INIT, dtype=self.dtype,
                               name="vid_proj")(vid_feat)
            if "noPos" in self.ablation and not deterministic:
                key = self.make_rng("permute")
                positions = jax.vmap(
                    lambda k: jax.random.permutation(k, Lv))(
                        jax.random.split(key, B)).astype(self.dtype)
            else:
                positions = jnp.tile(
                    jnp.arange(Lv, dtype=self.dtype)[None, :], (B, 1))
            frame_emb = nn.Dense(d // 2, kernel_init=DENSE_INIT,
                                 dtype=self.dtype,
                                 name="frameid_proj")(positions[..., None])
            vid_x = jnp.concatenate([vid_emb, frame_emb], axis=-1)
        else:
            vid_x = nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                             name="vid_proj")(vid_feat.astype(self.dtype))

        if self.user_id_max >= 0:
            usr_x = nn.Embed(self.user_id_max + 1, d,
                             embedding_init=DENSE_INIT, dtype=self.dtype,
                             name="usr_proj")(usr_feat)
        else:
            usr_x = nn.Dense(d, kernel_init=DENSE_INIT, dtype=self.dtype,
                             name="usr_proj")(usr_feat.astype(self.dtype))

        # ---- learned positional embeddings + LN + dropout (425-473) ----
        vid_pe_table = self.param("vid_pe", DENSE_INIT, (self.max_vid_len, d),
                                  self.dtype)
        usr_pe_table = self.param("usr_pe", DENSE_INIT, (self.max_usr_len, d),
                                  self.dtype)
        if self.use_pe:
            vid_x = vid_x + vid_pe_table[None, :vid_x.shape[1]]
            usr_x = usr_x + usr_pe_table[None, :usr_x.shape[1]]
        vid_x = drop(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="vid_ln")(vid_x),
                     deterministic=deterministic)
        usr_x = drop(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="usr_ln")(usr_x),
                     deterministic=deterministic)

        # ---- ablation MLP paths (encoder.py:503-511) ----
        if self.ablation == "CrossMLP":
            hidden = [d] * max(self.num_layers - 4, 0)
            out = MLPBlock(input_dim=d, hidden_units=hidden, output_dim=d,
                           dropout=self.dropout, name="encoder_mlp")(
                jnp.concatenate([usr_x, vid_x], axis=-2),
                deterministic=deterministic)
            return [_adaptive_avg_pool_seq(out, self.max_vid_len)], usr_x
        if self.ablation == "SelfMLP":
            hidden = [d] * max(self.num_layers - 2, 0)
            out = MLPBlock(input_dim=d, hidden_units=hidden, output_dim=d,
                           dropout=self.dropout, name="encoder_mlp")(
                vid_x, deterministic=deterministic)
            return [out], usr_x
        if self.ablation == "w/oAtt":
            return [vid_x], usr_x

        # ---- encoder stack (encoder.py:302-324) ----
        # intermediate_states[i] is the INPUT to layer i (post-patch-merge);
        # output_layers indexes into that list, so only layers
        # 0..max(output_layers)-1 are observable.
        output_layers = list(self.output_layers) if self.output_layers is not None \
            else list(range(self.num_layers))
        wanted = sorted({i % self.num_layers for i in output_layers})
        n_run = max(wanted) if wanted else 0

        sr_lvls = (list(self.sr_ratio_lvls)
                   if self.sr_ratio_lvls is not None
                   else [1] * self.num_layers)
        merge_lvls = (list(self.use_patch_merge)
                      if self.use_patch_merge is not None
                      else [False] * self.num_layers)
        if not (len(sr_lvls) == len(merge_lvls) == self.num_layers):
            raise ValueError(
                "sr_ratio_lvls / use_patch_merge must have num_layers "
                "entries (encoder.py:259)")
        pyramid = any(r > 1 for r in sr_lvls) or any(merge_lvls)
        if pyramid and (self.fused_attention or self.fuse_layer):
            raise ValueError(
                "the sr_ratio/patch-merge pyramid changes per-layer video "
                "shapes; it is supported on the unfused (XLA) attention "
                "path only — set fused_attention=False / fuse_layer=False")

        # The fused-layer kernel saves only the layer INPUTS and recomputes
        # the forward inside its backward kernel (flash-style), so wrapping
        # it in nn.remat would replay the whole layer forward a third time
        # per step for nothing — bypass layer-scope remat exactly like the
        # fused path already bypasses remat_attention. fuse_layer only takes
        # effect on the non-ablated path (SegFormerXLayer.__call__ gate) AND
        # when the kernel path will actually be taken (fused_layer_stream
        # falls back to the composed XLA path off-TPU when not in interpret
        # mode — there standard autodiff saves activations, so remat must
        # stay on); ablation runs keep their remat either way.
        kernel_path = self.interpret or jax.default_backend() in ("tpu",
                                                                  "axon")
        fused_layer_active = (self.fuse_layer and kernel_path
                              and "CrossAtt" not in self.ablation
                              and "SelfAtt" not in self.ablation)
        whole_layer_remat = (self.remat and self.remat_scope == "layer"
                             and not fused_layer_active)
        layer_cls = (nn.remat(SegFormerXLayer, static_argnums=(5,))
                     if whole_layer_remat else SegFormerXLayer)
        states = []
        vid_cur, vid_mask_cur = vid_x, vid_mask
        vid_pe_cur = (vid_pe_table[None, :Lv].astype(self.dtype)
                      if (self.use_pe and pyramid) else None)
        usr_cur = usr_x
        for i in range(n_run + 1):
            if merge_lvls[i]:
                # patch merge before layer i (encoder.py:296-318): conv
                # halves the video length; the mask is any-pooled over pairs
                # and the PE avg-pooled over pairs (the reference's
                # _interpolate_to_same_size is a fixed k2-s2 avg_pool that
                # ignores its size argument) and re-added through pe_ln_i.
                L = vid_cur.shape[1]
                if L % 2:
                    raise ValueError(
                        f"patch merge at layer {i} needs an even video "
                        f"length, got {L} (the reference's conv/avg_pool "
                        "pair disagrees on odd lengths)")
                vid_cur = nn.Conv(
                    features=d, kernel_size=(3,), strides=(2,),
                    padding=[(1, 1)], kernel_init=DENSE_INIT,
                    dtype=self.dtype, name=f"patch_merge_{i}")(vid_cur)
                vid_mask_cur = vid_mask_cur.reshape(B, L // 2, 2).any(-1)
                if vid_pe_cur is not None:
                    vid_pe_cur = vid_pe_cur.reshape(1, L // 2, 2, d).mean(2)
                    vid_cur = nn.LayerNorm(
                        epsilon=LN_EPS, dtype=self.dtype,
                        name=f"pe_ln_{i}")(vid_pe_cur + vid_cur)
            states.append(vid_cur)
            if i == n_run:
                break
            vid_cur, usr_next = layer_cls(
                d_model=d, num_heads=self.num_heads, ff_dim=self.ff_dim,
                dropout=self.dropout, ablation=self.ablation,
                dtype=self.dtype, fused=self.fused_attention,
                interpret=self.interpret,
                fuse_projections=self.fuse_projections,
                fuse_qkv=self.fuse_qkv, fuse_dual=self.fuse_dual,
                fuse_layer=self.fuse_layer,
                sr_ratio=sr_lvls[i],
                remat_attention=(self.remat
                                 and self.remat_scope == "attention"),
                name=f"layer_{i}")(usr_cur, usr_mask, vid_cur, vid_mask_cur,
                                   deterministic)
            if usr_next is not None:
                usr_cur = usr_next

        selected = [states[i % self.num_layers] for i in output_layers]
        return selected, usr_cur


def _nearest_resize_seq(x: jax.Array, out_len: int) -> jax.Array:
    """torch ``F.interpolate(mode='nearest')`` over the sequence axis of
    (B, L, D): output position i reads input position floor(i * L / out)."""
    import numpy as np
    L = x.shape[1]
    idx = (np.arange(out_len) * L) // out_len
    return x[:, jnp.asarray(idx, jnp.int32), :]


class SegFormerXFPN(nn.Module):
    """Feature-pyramid head over the encoder's intermediate video states
    (encoder.py:523-559).

    The reference class is dead code with a version-skewed forward signature
    (it calls ``backbone(vid_feat=..., txt_feat=..., txt_mask=...,
    word_mask=...)``, keywords SegFormerX.forward does not accept, so it
    cannot run). This is the working equivalent of its architecture: 1x1-conv
    adapters to a common width, nearest-neighbor top-down upsample-add, and
    3-wide output convs — applied to the (selected, usr) states our
    SegFormerX returns. Reference quirk kept: the top-down pass adds each
    level's ORIGINAL (pre-update) neighbor, not the accumulated one
    (encoder.py:555-556 mutates fpn_states[idx] after fpn_states[idx-1]
    already consumed it).
    """
    output_layer: Sequence[int] = (0, 2, 3)
    fpn_hidden_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states: Sequence[jax.Array]):
        sel = [states[i] for i in self.output_layer]
        fpn = [nn.Dense(self.fpn_hidden_size, kernel_init=DENSE_INIT,
                        dtype=self.dtype, name=f"adapter_{i}")(s)
               for i, s in enumerate(sel)]
        merged = [
            fpn[i] + _nearest_resize_seq(fpn[i + 1], fpn[i].shape[1])
            if i + 1 < len(fpn) else fpn[i]
            for i in range(len(fpn))
        ]
        return [nn.Conv(features=self.fpn_hidden_size, kernel_size=(3,),
                        padding=[(1, 1)], kernel_init=DENSE_INIT,
                        dtype=self.dtype, name=f"out_conv_{i}")(m)
                for i, m in enumerate(merged)]
