"""Latest + best-on-monitored-metric checkpointing.

Behavioral spec: /root/reference/MMinterest/models/kn_util/nn_utils/checkpoint.py
(CheckPointer :11-75): every save writes ``ckpt-latest``; when the monitored
metric improves, the previous best file is removed and a new
``ckpt-best-ep{epoch}-{metric}`` is written. ``load_checkpoint(mode='best')``
globs for the best file.

State is a pytree (params, opt_state, epoch, metrics, ...) serialized with
flax.serialization msgpack — a single host-side file per save, which is the
right shape for the reference's single-logical-state training loop. (Sharded
multi-host array checkpointing can layer orbax underneath without changing
this interface.)
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Any, Dict, Optional

import numpy as np
import jax
from flax import serialization


class CheckPointer:
    def __init__(self, monitor: str, work_dir: str, mode: str = "min") -> None:
        self.monitor = monitor
        self.best_metric: Optional[float] = None
        self.work_dir = work_dir
        self.mode = mode
        os.makedirs(work_dir, exist_ok=True)
        self.ckpt_latest = osp.join(work_dir, "ckpt-latest.msgpack")
        self.ckpt_best_fmt = osp.join(work_dir, "ckpt-best-ep{}-{}.msgpack")

    def better(self, new: float, orig: Optional[float]) -> bool:
        if orig is None:
            return True
        return new < orig if self.mode == "min" else new > orig

    @staticmethod
    def _to_host(tree):
        return jax.tree.map(lambda x: np.asarray(x), tree)

    def save_checkpoint(self, state: Dict[str, Any], num_epochs: int,
                        metric_vals: Optional[Dict[str, float]] = None) -> bool:
        """Write latest; update best when metric_vals[monitor] improves.
        Returns True when a new best was written."""
        save_dict = dict(state=self._to_host(state), num_epochs=num_epochs,
                         metrics=metric_vals or {})
        data = serialization.to_bytes(save_dict)
        with open(self.ckpt_latest, "wb") as f:
            f.write(data)
        if metric_vals:
            val = float(metric_vals[self.monitor])
            if self.better(val, self.best_metric):
                self.best_metric = val
                for old in glob.glob(self.ckpt_best_fmt.format("*", "*")):
                    os.remove(old)
                best_path = self.ckpt_best_fmt.format(
                    num_epochs, np.round(val, decimals=6))
                with open(best_path, "wb") as f:
                    f.write(data)
                return True
        return False

    def load_checkpoint(self, target: Dict[str, Any],
                        mode: str = "latest") -> Dict[str, Any]:
        """Deserialize into the structure of ``target`` (a template pytree of
        the same shape as what was saved)."""
        if mode == "latest":
            fn = self.ckpt_latest
        elif mode == "best":
            candidates = glob.glob(self.ckpt_best_fmt.format("*", "*"))
            if not candidates:
                raise FileNotFoundError(f"no best checkpoint in {self.work_dir}")
            fn = candidates[0]
        else:
            raise NotImplementedError(mode)
        with open(fn, "rb") as f:
            data = f.read()
        template = dict(state=self._to_host(target), num_epochs=0, metrics={})
        return serialization.from_bytes(template, data)
