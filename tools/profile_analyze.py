"""Summarize a jax.profiler TPU trace: top self-time ops + category split.

  python tools/perf_ab.py --name prof --remat_scope attention \
      --profile_dir /tmp/tpu_profile --steps 6
  python tools/profile_analyze.py /tmp/tpu_profile

Uses tensorboard_plugin_profile's converters on the captured xplane.pb.
"""

from __future__ import annotations

import glob
import json
import sys


def find_xplane(root: str) -> str:
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    return paths[-1]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_profile"
    xplane = find_xplane(root)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "op_profile", {})
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        out = out if out is not None else []
        m = node.get("metrics", {})
        out.append((node.get("name", "?"), m.get("time", 0.0),
                    m.get("flops", 0.0), depth))
        for c in node.get("children", []):
            walk(c, depth + 1, out)
        return out

    by_cat = prof.get("byCategory", {})
    total_time = by_cat.get("metrics", {}).get("time", 0.0)
    print(f"total profiled time fraction basis: {total_time:.4f}")
    cats = by_cat.get("children", [])
    rows = []
    for cat in cats:
        m = cat.get("metrics", {})
        rows.append((cat.get("name", "?"), m.get("time", 0.0),
                     m.get("flops", 0.0)))
    rows.sort(key=lambda r: -r[1])
    print("\n== categories (time fraction, flop utilization) ==")
    for name, t, f in rows[:15]:
        print(f"  {t:7.4f}  flops_util={f:6.4f}  {name}")
    print("\n== deepest hot ops ==")
    leaves = []
    for cat in cats:
        for prog in cat.get("children", []):
            m = prog.get("metrics", {})
            leaves.append((prog.get("name", "?"), m.get("time", 0.0),
                           m.get("flops", 0.0)))
    leaves.sort(key=lambda r: -r[1])
    for name, t, f in leaves[:25]:
        print(f"  {t:7.4f}  flops_util={f:6.4f}  {name[:100]}")


if __name__ == "__main__":
    main()
