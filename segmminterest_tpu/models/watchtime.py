"""Watch-time prediction models: WLR/D2Q backbone and the TPM tree model.

Behavioral spec: /root/reference/MMinterest/watchtime/
 * main_for_WatchTime_WLR.py:78-113  — D2QModel: user/item/duration embeddings
   -> 512-256-128-64-1 Swish MLP, sigmoid. WLR trains it with BCE on
   play_time > 60th-percentile; D2Q (main_for_WatchTime_D2Q.py) trains the
   same model with MSE on min(play/40, 1).
 * main_for_WatchTime_TPM.py:68-113  — TreeModelFastTest: embeddings ->
   128-64-32-(bucknum-1) ReLU MLP with dropout, sigmoid node probabilities.
 * main_for_WatchTime_TPM.py:114-206 — binary-tree quantile machinery:
   label_encoding, label-encoding BCE, expected playtime + variance.

TPM quirks kept verbatim: the label-encoding loss applies
binary_cross_entropy_with_logits to node *probabilities* (sigmoid outputs),
and node traversal log-probs use log(p + 1e-5).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# torch nn.Embedding/Linear default init: N(0,1) for Embedding,
# kaiming-uniform for Linear; we use flax defaults (lecun_normal) — the models
# are trained from scratch so only the distribution scale matters.


def swish(x):
    return x * jax.nn.sigmoid(x)


class D2QModel(nn.Module):
    """(user, item, duration) -> predicted watch fraction in [0, 1]."""
    max_item: int
    max_user: int
    max_duration: int = 200
    emb_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, user_id, item_id, duration):
        item_emb = nn.Embed(self.max_item + 1, self.emb_size,
                            dtype=self.dtype, name="item_embedding")(item_id)
        user_emb = nn.Embed(self.max_user + 1, self.emb_size,
                            dtype=self.dtype, name="user_embedding")(user_id)
        dur_emb = nn.Embed(self.max_duration, self.emb_size, dtype=self.dtype,
                           name="duration_embedding")(duration)
        x = jnp.concatenate([item_emb, user_emb, dur_emb], axis=-1)
        for i, h in enumerate([512, 256, 128, 64]):
            x = swish(nn.Dense(h, dtype=self.dtype, name=f"fc_{i}")(x))
        x = nn.Dense(1, dtype=self.dtype, name="fc_out")(x)
        return jax.nn.sigmoid(x)


class TreeModel(nn.Module):
    """(user, item, duration) -> (bucknum-1) sigmoid tree-node probabilities."""
    max_item: int
    max_user: int
    class_num: int
    dropout: float = 0.2
    max_duration: int = 200
    emb_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, user_id, item_id, duration, *, deterministic: bool):
        item_emb = nn.Embed(self.max_item + 1, self.emb_size,
                            dtype=self.dtype, name="item_embedding")(item_id)
        user_emb = nn.Embed(self.max_user + 1, self.emb_size,
                            dtype=self.dtype, name="user_embedding")(user_id)
        dur_emb = nn.Embed(self.max_duration, self.emb_size, dtype=self.dtype,
                           name="duration_embedding")(duration)
        x = jnp.concatenate([item_emb, user_emb, dur_emb], axis=-1)
        drop = nn.Dropout(self.dropout)
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc1")(x))
        x = drop(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc2")(x))
        x = drop(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(32, dtype=self.dtype, name="fc3")(x))
        logits = nn.Dense(self.class_num, dtype=self.dtype, name="fc_out")(x)
        return jax.nn.sigmoid(logits)


def playtime_percentiles(playing_time_ms: np.ndarray,
                         bucknum: int) -> Tuple[np.ndarray, np.ndarray]:
    """Quantile bucket edges over play time in segments
    (main_for_WatchTime_TPM.py:114-124)."""
    play = playing_time_ms / 5000.0
    edges = np.percentile(
        play, np.linspace(0.0, 100.0, num=bucknum + 1).astype(np.float32))
    return (np.asarray(edges[:-1], np.float32)[None, :],
            np.asarray(edges[1:], np.float32)[None, :])


def tpm_label_encoding(bucknum: int, cmp_ratio: jax.Array,
                       begins: jax.Array, ends: jax.Array):
    """Per-tree-node binary labels + sample weights
    (main_for_WatchTime_TPM.py:126-148). cmp_ratio: (B,) target playtime."""
    height = int(math.log2(bucknum))
    labels, weights = {}, {}
    c = cmp_ratio[:, None]
    for i in range(height):
        for j in range(2 ** i):
            idx = max(int(bucknum / (2 ** i) * j) - 1, 0)
            if j == 0:
                w = (c < begins[:, idx:idx + 1]).astype(jnp.float32)
            else:
                w = (c < ends[:, idx:idx + 1]).astype(jnp.float32)
            idx = max(int(bucknum / (2 ** i) * (j + 1)) - 1, 0)
            w = (c < ends[:, idx:idx + 1]).astype(jnp.float32) * w
            idx = max(int(bucknum * (1.0 / (2 ** i) * j
                                     + 1.0 / (2 ** (i + 1)))) - 1, 0)
            lab = (c >= ends[:, idx:idx + 1]).astype(jnp.float32)
            labels[1000 * i + j] = lab[:, 0]
            weights[1000 * i + j] = w[:, 0]
    return labels, weights


def tpm_label_encoding_loss(labels, weights, node_probs, bucknum: int,
                            row_mask):
    """Weighted BCE-with-logits applied to node *probabilities* — a reference
    quirk (main_for_WatchTime_TPM.py:150-162)."""
    height = int(math.log2(bucknum))
    total = 0.0
    for i in range(height):
        for j in range(2 ** i):
            lab = labels[1000 * i + j]
            w = weights[1000 * i + j] * row_mask
            x = node_probs[:, 2 ** i - 1 + j]
            ce = jnp.maximum(x, 0) - x * lab + jnp.log1p(jnp.exp(-jnp.abs(x)))
            total = total + (ce * w).sum()
    return total / (bucknum - 1.0)


def tpm_encoded_playtime(node_probs: jax.Array, bucknum: int,
                         begins: jax.Array, ends: jax.Array):
    """Expected playtime + sqrt-variance from the leaf distribution
    (main_for_WatchTime_TPM.py:164-191)."""
    height = int(math.log2(bucknum))
    mid = (begins + ends) / 2.0  # (1, bucknum)
    leaf_logps = []
    for i in range(bucknum):
        cur = 2 ** height - 1 + i
        logp = 0.0
        for _ in range(height):
            branch = cur % 2
            parent = (cur - 1) // 2
            cur = parent
            p = node_probs[:, parent]
            logp = logp + jnp.where(branch == 1,
                                    jnp.log(1.0 - p + 1e-5),
                                    jnp.log(p + 1e-5))
        leaf_logps.append(logp)
    probs = jnp.exp(jnp.stack(leaf_logps, axis=1))  # (B, bucknum)
    expected = jnp.sum(mid * probs, axis=-1, keepdims=True)
    # reference quirk: e_x2 uses the already-reduced expectation, so the
    # variance collapses to E[x]^2 * (sum(probs) - 1) ~ 0; the sqrt is
    # epsilon-guarded because sqrt'(0) is infinite (torch would NaN here too)
    e_x2 = jnp.sum(jnp.square(expected) * probs, axis=-1, keepdims=True)
    var = jnp.sqrt(jnp.maximum(e_x2 - jnp.square(expected), 0.0) + 1e-12)
    return expected, var


def tpm_loss(node_probs, target_playtime, begins, ends, bucknum: int,
             mse_weight: float, var_weight: float, row_mask):
    """Total TPM loss (main_for_WatchTime_TPM.py:193-206)."""
    expected, var = tpm_encoded_playtime(node_probs, bucknum, begins, ends)
    labels, weights = tpm_label_encoding(bucknum, target_playtime, begins, ends)
    enc_loss = tpm_label_encoding_loss(labels, weights, node_probs, bucknum,
                                       row_mask)
    n = jnp.maximum(row_mask.sum(), 1)
    mse = (jnp.square(expected[:, 0] - target_playtime) * row_mask).sum() / n
    var_sum = (var[:, 0] * row_mask).sum()
    return enc_loss + mse * mse_weight + var_sum * var_weight, expected
