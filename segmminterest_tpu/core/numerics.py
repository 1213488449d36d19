"""Mask-aware numerical primitives shared by every model in the framework.

These re-derive, in stable fixed-shape JAX, the survival-analysis chain and the
masking conventions of the reference implementation
(/root/reference/MMinterest/models/decoder_leave_focal.py:506-515 and
/root/reference/MMinterest/models/encoder.py:64-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference fills masked attention logits with -10000.0 *before* the
# 1/sqrt(d_head) scaling (encoder.py:71 then :117,146). We replicate that
# convention exactly so that softmax outputs are bit-comparable at fp32.
MASK_FILL_VALUE = -10000.0


def log_survival_from_logits(logits: jax.Array) -> jax.Array:
    """``h_t = cumsum(log(sigmoid(logits)))`` along the segment axis.

    The reference computes ``torch.cumsum(torch.log(torch.sigmoid(x)), dim=1)``
    (decoder_leave_focal.py:506-511). ``log(sigmoid(x))`` underflows to -inf for
    very negative x in fp32; ``jax.nn.log_sigmoid`` is the mathematically
    identical, numerically stable formulation.
    """
    return jnp.cumsum(jax.nn.log_sigmoid(logits), axis=1)


def survival_from_logits(logits: jax.Array):
    """Return ``(h_t, survival, hazard)`` for per-segment interest logits.

    survival  S(t) = exp(h_t)  — probability the user is still watching at t.
    hazard    1 - S(t)         — probability the user has left by t.
    (decoder_leave_focal.py:506-515)
    """
    h_t = log_survival_from_logits(logits)
    survival = jnp.exp(h_t)
    hazard = 1.0 - survival
    return h_t, survival, hazard


def l1_normalize(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """``x / (||x||_1 + eps)`` along the last axis.

    Mirrors the host-side feature normalization of the reference train loop
    (main_for_seq_leave_earlystop_SegMM.py:272-273), moved on-device so it can
    fuse with the input projection matmul.
    """
    norm = jnp.sum(jnp.abs(x), axis=-1, keepdims=True)
    return x / (norm + eps)


def masked_attention_logits(q: jax.Array, k: jax.Array,
                            mask_q: jax.Array, mask_k: jax.Array) -> jax.Array:
    """Raw (unscaled) attention logits with the reference's mask convention.

    q: (B, Lq, H, Dh), k: (B, Lk, H, Dh), masks boolean (B, Lq)/(B, Lk).
    Returns (B, H, Lq, Lk) with masked entries set to MASK_FILL_VALUE.
    (encoder.py:44-73 — note: no 1/sqrt(d) here; scaling happens after the
    fill in the caller, matching the reference order of operations.)
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    pair_mask = mask_q[:, None, :, None] & mask_k[:, None, None, :]
    return jnp.where(pair_mask, logits, MASK_FILL_VALUE)
