"""Whisper audio feature extraction for video segments.

Behavioral spec: /root/reference/data_process/audio_feature_extractor.py:
 * 16 kHz audio split into 5 s segments (:23-34);
 * Whisper encoder over each segment's log-mel features, taking the FIRST
   decoder-position hidden state as the segment embedding (:50-58);
 * batched output + pid -> line-range accounting with resume-from-done-list
   (:76-122) — covered by extractors.cache here.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000
SEGMENT_SECONDS = 5


def split_audio(waveform: np.ndarray,
                segment_seconds: int = SEGMENT_SECONDS) -> List[np.ndarray]:
    """Split a 16 kHz waveform into 5 s chunks (reference :23-34)."""
    step = SAMPLE_RATE * segment_seconds
    return [waveform[s:s + step] for s in range(0, len(waveform), step)]


class AudioExtractor:
    def __init__(self, weights_path: Optional[str] = None,
                 random_init: bool = False,
                 config_overrides: Optional[dict] = None,
                 inner_batch: int = 8):
        from transformers import (FlaxWhisperModel, WhisperConfig,
                                  WhisperFeatureExtractor)
        if weights_path:
            self.model = FlaxWhisperModel.from_pretrained(weights_path)
            self.fe = WhisperFeatureExtractor.from_pretrained(weights_path)
        elif random_init:
            cfg = WhisperConfig(**(config_overrides or {}))
            self.model = FlaxWhisperModel(cfg)
            self.fe = WhisperFeatureExtractor(
                feature_size=cfg.num_mel_bins)
        else:
            raise ValueError("pass weights_path or random_init=True "
                             "(no network egress in this environment)")
        self.config = self.model.config
        self.inner_batch = inner_batch

        @jax.jit
        def forward(params, input_features):
            # one decoder step from decoder_start_token: its hidden state is
            # the segment embedding (reference :50-58)
            B = input_features.shape[0]
            decoder_ids = jnp.full((B, 1),
                                   self.config.decoder_start_token_id,
                                   jnp.int32)
            out = self.model.module.apply(
                {"params": params}, input_features=input_features,
                decoder_input_ids=decoder_ids,
                decoder_attention_mask=jnp.ones((B, 1), jnp.int32),
                decoder_position_ids=jnp.zeros((B, 1), jnp.int32))
            return out.last_hidden_state[:, 0, :]   # (B, D)

        self._forward = forward

    @property
    def feat_dim(self) -> int:
        return self.config.d_model

    def extract_waveform(self, waveform: np.ndarray) -> np.ndarray:
        """Full-video 16 kHz waveform -> (n_segments, d_model) embeddings."""
        segments = split_audio(waveform)
        feats = self.fe([np.asarray(s, np.float32) for s in segments],
                        sampling_rate=SAMPLE_RATE, return_tensors="np")
        x = feats["input_features"]
        outs = []
        bs = self.inner_batch
        for start in range(0, x.shape[0], bs):
            chunk = x[start:start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            out = np.asarray(self._forward(self.model.params,
                                           jnp.asarray(chunk)))
            outs.append(out[: bs - pad])
        return np.concatenate(outs, axis=0)
