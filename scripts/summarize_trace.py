"""Summarise per-op device time from a jax.profiler xplane trace.

Usage: python scripts/summarize_trace.py <trace_dir_or_xplane.pb> [steps]

``steps`` is the number of traced steps to divide totals by (default 1).
Times are reported per step, sorted descending. Metadata (op_name) is
appended when present so fusions can be attributed to model code.
"""

import glob
import os
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if os.path.isdir(path):
        pbs = sorted(glob.glob(
            os.path.join(path, "**", "*.xplane.pb"), recursive=True
        ))
        path = pbs[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        meta = {}
        stats_meta = {m.id: m.name for m in p.stat_metadata.values()}
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                name = md.name.split(" = ")[0] if " = " in md.name else md.name
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
                if name not in meta and " = " in md.name:
                    meta[name] = md.name.split(" = ", 1)[1]
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        total = sum(tot.values())
        print(f"PLANE {p.name}  accounted {total/steps:.1f} ms/step "
              f"(overlaps double-count; while bodies nest)")
        topn = int(os.environ.get("TRACE_TOP", "40"))
        for k, v in items[:topn]:
            print(f"{v/steps:9.3f} ms/step x{cnt[k]//steps:5d}  {k[:60]:60s}"
                  f"  {meta.get(k, '')[:110]}")
        # category rollup (while bodies excluded — their children are
        # separately attributed)
        import re

        buckets = {
            "while(container)": r"^%while",
            "traj kernel": r"^%attn\.",
            "patch kernel": r"patch_embed",
            "matmul fused": r"convolution",
            "residual add": r"add_add_fusion",
            "fc2+copy": r"copy_add_fusion",
            "layout copy": r"^%copy",
            "pad": r"^%pad",
            "bitcast/reshape": r"bitcast|reshape|transpose",
            "reduce/LN": r"reduce|fusion\.1[45]",
        }
        agg = {}
        for k, v in tot.items():
            for b, pat in buckets.items():
                if re.search(pat, k):
                    agg[b] = agg.get(b, 0.0) + v
                    break
            else:
                agg["other"] = agg.get("other", 0.0) + v
        print("---- category rollup (ms/step) ----")
        for b, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{v/steps:9.3f}  {b}")


if __name__ == "__main__":
    main()
