"""Feature-extraction CLI: raw frames/audio -> crash-safe cache -> the
memmap feature store consumed by training.

Mirrors /root/reference/data_process/visual_feature_extractor.py (CLI with
--group_id process sharding, skip-if-cached, final merge) and
audio_feature_extractor.py.

  # visual, one process of 8, frames laid out as <frames_dir>/<pid>/NNN.npy
  python -m segmminterest_tpu.tasks.extract_features --modality visual \
      --frames_dir frames/ --cache_dir cache_v --weights /path/to/clip \
      --group_id 0 --num_groups 8

  # final assembly into the training feature store
  python -m segmminterest_tpu.tasks.extract_features --assemble \
      --cache_dir cache_v --memmap SegMM_feat_memmap.dat \
      --lineid_map SegMM_photoidframeid2lineid.json --feat_dim 1024
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp

import numpy as np

from ..extractors import (AudioExtractor, ExtractionCache, VisualExtractor,
                          assemble_memmap)
from ..extractors.visual import shard_work

logger = logging.getLogger(__name__)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--modality", type=str, default="visual",
                   choices=["visual", "audio"])
    p.add_argument("--frames_dir", type=str, default="",
                   help="visual: <dir>/<pid>/ with per-frame .npy images; "
                        "audio: <dir>/<pid>.npy 16 kHz waveforms")
    p.add_argument("--cache_dir", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--random_init", type=int, default=0,
                   help="build the architecture with fresh weights "
                        "(pipeline testing without local checkpoints)")
    p.add_argument("--group_id", type=int, default=0)
    p.add_argument("--num_groups", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=40)
    p.add_argument("--assemble", action="store_true")
    p.add_argument("--memmap", type=str, default="")
    p.add_argument("--lineid_map", type=str, default="")
    p.add_argument("--feat_dim", type=int, default=1024)
    args = p.parse_args(argv)

    cache = ExtractionCache(args.cache_dir)
    if args.assemble:
        total = assemble_memmap(cache, args.memmap, args.lineid_map,
                                args.feat_dim)
        print(f"assembled {total} lines -> {args.memmap}")
        return

    if args.modality == "visual":
        extractor = VisualExtractor(weights_path=args.weights or None,
                                    random_init=bool(args.random_init))
    else:
        extractor = AudioExtractor(weights_path=args.weights or None,
                                   random_init=bool(args.random_init))

    items = sorted(os.listdir(args.frames_dir))
    items = shard_work(items, args.group_id, args.num_groups)
    done = skipped = 0
    for item in items:
        pid = osp.splitext(item)[0]
        if cache.key_exists(pid):
            skipped += 1
            continue
        path = osp.join(args.frames_dir, item)
        if args.modality == "visual":
            frame_files = sorted(os.listdir(path))[: args.max_frames]
            frames = np.stack([np.load(osp.join(path, f))
                               for f in frame_files])
            feats = extractor.extract_frames(frames)
        else:
            waveform = np.load(path)
            feats = extractor.extract_waveform(waveform)[: args.max_frames]
        cache.save(pid, feats)
        done += 1
        if done % 50 == 0:
            logger.info("extracted %d (skipped %d cached)", done, skipped)
    print(f"extracted {done}, skipped {skipped} cached, "
          f"group {args.group_id}/{args.num_groups}")


if __name__ == "__main__":
    main()
