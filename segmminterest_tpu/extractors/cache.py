"""Crash-safe extraction cache + memmap feature-store assembly.

Behavioral spec: /root/reference/MMinterest/utils/util_file.py
(LargeHDF5Cache :131-204): per-key tmp files with ``.finish`` flags so a
crashed/parallel extraction run resumes exactly where it stopped
(visual_feature_extractor.py:172-205); a final merge pass consolidates the
shards. Here the consolidated store is the training-side format directly:
the float32 memmap + "{photo_id}-{frame}" -> line json of SegMM.md
("Read the Data").
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Iterator, Tuple

import numpy as np


class ExtractionCache:
    """Per-key .npy shards with .finish flags (LargeHDF5Cache semantics)."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _paths(self, key: str) -> Tuple[str, str]:
        safe = str(key).replace("/", "_")
        return (osp.join(self.cache_dir, safe + ".npy"),
                osp.join(self.cache_dir, safe + ".finish"))

    def key_exists(self, key: str) -> bool:
        """True iff the key was fully written (the .finish flag exists —
        util_file.py:146-149)."""
        return osp.exists(self._paths(key)[1])

    def save(self, key: str, array: np.ndarray) -> None:
        """Write the shard, then the flag (torn writes leave no flag)."""
        data_path, flag_path = self._paths(key)
        np.save(data_path, np.asarray(array, dtype=np.float32))
        with open(flag_path, "w"):
            pass

    def load(self, key: str) -> np.ndarray:
        return np.load(self._paths(key)[0])

    def keys(self) -> Iterator[str]:
        for name in sorted(os.listdir(self.cache_dir)):
            if name.endswith(".finish"):
                yield name[: -len(".finish")]


def assemble_memmap(cache: ExtractionCache, memmap_path: str,
                    lineid_map_path: str, feat_dim: int) -> int:
    """Merge all finished shards into the training-side feature store:
    float32 memmap (total_lines, feat_dim) + "{key}-{frame}" -> line json
    (the final_save + memmap-prep step, util_file.py:164-175 +
    main_for_seq_leave_earlystop_SegMM.py:35-40). Returns total lines."""
    keys = list(cache.keys())
    lineid_map: Dict[str, int] = {}
    total = 0
    shapes = {}
    for key in keys:
        arr = cache.load(key)
        assert arr.ndim == 2 and arr.shape[1] == feat_dim, \
            f"{key}: bad shape {arr.shape}"
        shapes[key] = arr.shape[0]
        for frame in range(arr.shape[0]):
            lineid_map[f"{key}-{frame}"] = total + frame
        total += arr.shape[0]
    mm = np.memmap(memmap_path, dtype="float32", mode="w+",
                   shape=(max(total, 1), feat_dim))
    row = 0
    for key in keys:
        arr = cache.load(key)
        mm[row:row + arr.shape[0]] = arr
        row += arr.shape[0]
    mm.flush()
    with open(lineid_map_path, "w") as f:
        json.dump(lineid_map, f)
    return total
