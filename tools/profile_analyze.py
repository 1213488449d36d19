"""Summarize a jax.profiler TPU trace: top self-time ops from the xplane.

  python tools/perf_ab.py --name prof --remat 0 --fuse_qkv 1 \
      --profile_dir /tmp/tpu_profile --steps 6
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/profile_analyze.py /tmp/tpu_profile

Parses the raw xplane.pb with tensorflow's xplane_pb2 (the
tensorboard_plugin_profile converters are version-skewed against the baked
tensorflow in this image — AttributeError on xspace_to_tools_data — and the
C++ protobufs mismatch, hence the pure-python env var; see CLAUDE.md trace
workflow)."""

from __future__ import annotations

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _category(name: str) -> str:
    """Rough op-category bucketing from the HLO text: the leading op name of
    '%foo.123 = type op-name(...)' or the bare metadata name."""
    if "custom-call" in name or "_fused_qkv_forward" in name \
            or "_fused_dual" in name or "fused_layer" in name \
            or "tpu_custom_call" in name:
        return "pallas custom-call"
    for key, cat in (("%fusion", "fusion"), ("%copy", "copy"),
                     ("%convert", "convert"), ("%transpose", "transpose"),
                     ("%bitcast", "bitcast"), ("%rng", "rng"),
                     ("%reduce", "reduce"), ("%dot", "dot"),
                     ("%dynamic", "dynamic-slice/update"),
                     ("%gather", "gather"), ("%scatter", "scatter"),
                     ("%all-", "collective"), ("%select", "select"),
                     ("%broadcast", "broadcast"), ("%iota", "iota"),
                     ("%concatenate", "concatenate"), ("%slice", "slice"),
                     ("%add", "elementwise"), ("%multiply", "elementwise"),
                     ("%subtract", "elementwise"), ("%divide", "elementwise"),
                     ("%tanh", "elementwise"), ("%exp", "elementwise")):
        if name.startswith(key):
            return cat
    if " = " in name:
        rhs = name.split(" = ", 1)[1]
        parts = rhs.split("(", 1)[0].split()
        op = parts[-1] if parts else rhs
        return op[:24]
    return name[:24]


def find_xplane(root: str) -> str:
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    return paths[-1]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_profile"
    xplane = find_xplane(root)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())

    # TPU op events live on the device plane's XLA-op lines; aggregate
    # self-duration by event name.
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        metadata = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        if not metadata:
            metadata = {k: v.name for k, v in plane.event_metadata.items()}
        per_op = collections.Counter()
        per_line = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = metadata.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                per_op[name] += dur
                per_line[line.name] += dur
        # the 'XLA Ops' line carries the SYNCHRONOUS per-op self time; the
        # 'Async XLA Ops' line carries copy-start->copy-done spans whose
        # durations overlap real work and must not be mixed into shares
        sync_op = collections.Counter()
        sync_cat = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = metadata.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                sync_op[name] += dur
                sync_cat[_category(name)] += dur
        if not per_op:
            continue
        total = sum(per_line.values())
        print(f"\n=== plane: {plane.name} ===")
        print("-- lines (ms summed over capture) --")
        for name, t in per_line.most_common(8):
            print(f"  {t:10.2f}  {name}")
        sync_total = sum(sync_cat.values())
        if sync_total:
            print(f"-- XLA Ops line, by category (self ms, {sync_total:.1f}"
                  " total) --")
            for name, t in sync_cat.most_common(20):
                print(f"  {t:10.2f}  {100 * t / sync_total:5.1f}%  {name}")
            print("-- XLA Ops line, top individual ops --")
            for name, t in sync_op.most_common(25):
                print(f"  {t:10.2f}  {100 * t / sync_total:5.1f}%  "
                      f"{name[:110]}")
        print("-- top ops by summed duration, ALL lines incl. async "
              "(overlapping spans; context only) --")
        for name, t in per_op.most_common(15):
            print(f"  {t:10.2f}  {100 * t / max(total, 1e-9):5.1f}%  "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
