"""Build frame-as-item leave-ranking datasets (the SkipPredBaseline data).

Behavioral spec: /root/reference/data_process/get_SegMM_data.py (D5):
 * every video segment becomes an item ("frame"); a global
   photo_id2frame_id map assigns each photo's segments consecutive frame ids;
 * train.csv = watched frames as positive interactions
   (user_id, item_id=frame, time, c_frame_length, photo_id);
 * dev/test.csv = the LEAVE frame as the target item plus the video's other
   frames as neg_items, padded to 39 with id 1 (plain) or a dedicated
   default item (Default variant, which also appends one default-item row);
 * item_meta.csv with i_pos_f = position/40 (get_item_pos).
Also writes the MMRec-style .inter export (get_data_MMRec.py, D6) and the
photo_id2frame_id_leave json consumed by the baseline-logits converter (D7).

  python -m segmminterest_tpu.tasks.build_leave_rank_data \
      --inter_csv /root/reference/SegMM_inter_sample.csv --out data \
      --min_interactions 30 --num_warmup 10
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np
import pandas as pd

from ..data.labels import frame_count
from ..data.reader import normalize_columns, split_interactions


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inter_csv", type=str, required=True)
    p.add_argument("--sep", type=str, default=",")
    p.add_argument("--out", type=str, default="data")
    p.add_argument("--name", type=str, default="SegMMstep1Ranking")
    p.add_argument("--min_interactions", type=int, default=100)
    p.add_argument("--num_warmup", type=int, default=80)
    p.add_argument("--seed", type=int, default=2024)
    args = p.parse_args(argv)

    df = normalize_columns(pd.read_csv(args.inter_csv, sep=args.sep))
    parts = split_interactions(df, seed=args.seed,
                               num_warmup=args.num_warmup,
                               min_interactions=args.min_interactions)
    combined = pd.concat([parts[k] for k in ("train", "dev", "test")],
                         ignore_index=True)
    uids = {u: i for i, u in enumerate(sorted(combined["user_id"].unique()), 1)}

    # global frame-id assignment: consecutive ids per photo's segments,
    # starting at 2 (0 = padding, 1 = the plain variant's filler id)
    photo2frames = {}
    next_id = 2
    durations = combined.drop_duplicates("video_id")[
        ["video_id", "duration_ms"]]
    for pid, dur in sorted(zip(durations["video_id"],
                               durations["duration_ms"])):
        n = min(frame_count(dur), 40)
        photo2frames[int(pid)] = list(range(next_id, next_id + n))
        next_id += n
    default_id = next_id

    def rows_for_split(part, phase, default_variant):
        """dev/test leave-frame target + same-video negatives
        (get_test_valid_data, :84-133)."""
        out = []
        pad = default_id if default_variant else 1
        for _, row in part.iterrows():
            frames = photo2frames[int(row["video_id"])]
            playing_length = max(1, frame_count(min(row["playing_time"],
                                                    row["duration_ms"])))
            if playing_length > len(frames):  # completed view: no leave slot
                continue
            leave = frames[playing_length - 1]
            negs = [f for f in frames if f != leave]
            if len(negs) < 39:
                negs = negs + [pad] * (39 - len(negs))
            out.append({
                "user_id": uids[row["user_id"]], "item_id": leave,
                "time": row["time_ms"], "neg_items": negs[:39],
                "c_frame_length": len(frames),
                "photo_id": int(row["video_id"])})
        if default_variant and out:
            # the Default variant appends one default-item row that the
            # leave-rank evaluator trims (get_test_valid_data_default
            # :180-182, evaluate_method 'Default' branch)
            out.append({**out[-1], "item_id": default_id,
                        "neg_items": [default_id] * 39})
        return pd.DataFrame(out)

    def train_rows(part):
        """watched frames as positives (load_train_data :42-66)."""
        out = []
        for _, row in part.iterrows():
            frames = photo2frames[int(row["video_id"])]
            watched = max(0, frame_count(min(row["playing_time"],
                                             row["duration_ms"])) - 1)
            for i in range(min(watched, len(frames))):
                out.append({"user_id": uids[row["user_id"]],
                            "item_id": frames[i], "time": row["time_ms"],
                            "c_frame_length": len(frames),
                            "photo_id": int(row["video_id"])})
        return pd.DataFrame(out)

    train_df = train_rows(parts["train"])
    for variant, default_variant in ((args.name, False),
                                     (args.name + "Default", True)):
        base = osp.join(args.out, variant)
        os.makedirs(base, exist_ok=True)
        train_df.to_csv(osp.join(base, "train.csv"), sep="\t", index=False)
        for phase in ("dev", "test"):
            d = rows_for_split(parts[phase], phase, default_variant)
            d.to_csv(osp.join(base, phase + ".csv"), sep="\t", index=False)
        # item_meta with positional feature (get_item_pos :190-204)
        meta = [{"item_id": f, "i_pos_f": pos / 40.0}
                for frames in photo2frames.values()
                for pos, f in enumerate(frames)]
        meta.append({"item_id": default_id, "i_pos_f": 0.5})
        meta.append({"item_id": 1, "i_pos_f": 0.5})
        pd.DataFrame(meta).sort_values("item_id").to_csv(
            osp.join(base, "item_meta.csv"), sep="\t", index=False)

    # the frame map for the D7 converter + MMRec eval
    map_path = osp.join(args.out, "photo_id2frame_id_leave.json")
    with open(map_path, "w") as f:
        json.dump({str(k): v for k, v in photo2frames.items()}, f)

    # MMRec-style .inter (get_data_MMRec.py): watched frames with x_label
    # split markers + default rows per user for dev/test
    inter_rows = []
    for x_label, phase in ((0, "train"), (1, "dev"), (2, "test")):
        part = parts[phase]
        for _, row in part.iterrows():
            frames = photo2frames[int(row["video_id"])]
            watched = max(1, frame_count(min(row["playing_time"],
                                             row["duration_ms"])))
            for i in range(min(watched, len(frames))):
                inter_rows.append((uids[row["user_id"]], frames[i],
                                   int(row["video_id"]), row["time_ms"],
                                   x_label))
    inter = pd.DataFrame(inter_rows, columns=["userID", "frame_id", "itemID",
                                              "time_ms", "x_label"])
    first = inter.drop_duplicates("userID").copy()
    for x_label in (1, 2):
        add = first.copy()
        add["frame_id"] = default_id
        add["x_label"] = x_label
        inter = pd.concat([inter, add], ignore_index=True)
    inter.to_csv(osp.join(args.out, "SegMMdefault.inter"), sep="\t",
                 index=False)
    print(f"wrote {args.name}[Default] (train {len(train_df)} rows, "
          f"{len(photo2frames)} photos, default_id={default_id}), "
          f"{map_path}, SegMMdefault.inter ({len(inter)})")


if __name__ == "__main__":
    main()
