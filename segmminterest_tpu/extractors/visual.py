"""CLIP ViT visual feature extraction for video segments.

Behavioral spec: /root/reference/data_process/visual_feature_extractor.py:
 * CLIP ViT-L/14-336 vision tower over one frame per 5 s segment (<= 40);
 * ``post_forward`` spatially average-pools the patch tokens (excluding the
   CLS token) into one 1024-d vector per frame (:121-137);
 * inner batching (:83-100), crash-safe per-video cache (:172-205).

TPU-first: the tower is a Flax CLIPVisionModel jitted at a fixed inner batch
(padded; extra rows masked out), so every video runs through one compiled
executable. Weights load from a local path (this environment has no network
egress; pass --weights with a flax msgpack/pytorch checkpoint directory), or
``random_init=True`` builds the architecture with fresh weights for pipeline
tests.

The reference's manual 8-process data parallelism (:243-273) maps to the
``group_id/num_groups`` sharding arguments, identical semantics.
"""

from __future__ import annotations

import functools
import logging
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class VisualExtractor:
    def __init__(self, weights_path: Optional[str] = None,
                 random_init: bool = False,
                 config_overrides: Optional[dict] = None,
                 inner_batch: int = 64):
        from transformers import CLIPVisionConfig, FlaxCLIPVisionModel
        if weights_path:
            self.model = FlaxCLIPVisionModel.from_pretrained(weights_path)
        elif random_init:
            cfg = CLIPVisionConfig(**(config_overrides or {}))
            self.model = FlaxCLIPVisionModel(cfg)
        else:
            raise ValueError("pass weights_path or random_init=True "
                             "(no network egress in this environment)")
        self.config = self.model.config
        self.inner_batch = inner_batch
        self.image_size = self.config.image_size

        @jax.jit
        def forward(params, pixel_values):
            out = self.model.module.apply(
                {"params": params}, pixel_values=pixel_values)
            hidden = out.last_hidden_state          # (B, 1+P, D)
            # spatial average pool over patch tokens, CLS excluded
            # (visual_feature_extractor.py:121-137)
            return hidden[:, 1:, :].mean(axis=1)    # (B, D)

        self._forward = forward

    @property
    def feat_dim(self) -> int:
        return self.config.hidden_size

    def preprocess(self, images: np.ndarray) -> np.ndarray:
        """uint8 (N, H, W, 3) -> normalized (N, S, S, 3) float32 with the
        CLIP mean/std (the HF image-processor transform)."""
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        x = images.astype(np.float32) / 255.0
        s = self.image_size
        if x.shape[1] != s or x.shape[2] != s:
            # nearest resize (the reference letterboxes host-side; for the
            # pipeline the exact resampler is a preprocessing choice)
            yi = (np.arange(s) * x.shape[1] / s).astype(int)
            xi = (np.arange(s) * x.shape[2] / s).astype(int)
            x = x[:, yi][:, :, xi]
        x = (x - mean) / std
        # the inner flax module consumes NHWC (the HF wrapper transposes
        # NCHW inputs; we call module.apply directly)
        return x

    def extract_frames(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 frames -> (N, feat_dim) float32, batched at a
        fixed padded inner batch so the forward compiles once."""
        pixels = self.preprocess(images)
        n = pixels.shape[0]
        outs = []
        bs = self.inner_batch
        for start in range(0, n, bs):
            chunk = pixels[start:start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            out = np.asarray(self._forward(self.model.params,
                                           jnp.asarray(chunk)))
            outs.append(out[: bs - pad])
        return np.concatenate(outs, axis=0)


def shard_work(items: Sequence, group_id: int, num_groups: int) -> List:
    """The reference's manual process sharding: contiguous groups
    (visual_feature_extractor.py:251-266)."""
    per = -(-len(items) // num_groups)
    return list(items[group_id * per:(group_id + 1) * per])
