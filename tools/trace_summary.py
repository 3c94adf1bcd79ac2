"""Categorize every device op in a saved xplane trace (full table, not top-40).

Usage: python tools/trace_summary.py <logdir> [iters]

Buckets the 'XLA Ops' timeline into attention / ff / conv-ish / copies /
other so the per-category totals can be compared against the padded-FLOP
roofline (tools/conv_inventory.py, PARITY.md).
"""

import os
import re
import sys
from collections import defaultdict


def parse_trace(logdir):
    from jax.profiler import ProfileData

    path = None
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                path = os.path.join(root, f)
    if path is None:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    data = ProfileData.from_serialized_xspace(open(path, "rb").read())
    rows = defaultdict(float)
    counts = defaultdict(int)
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "Steps" in line.name:
                continue
            for ev in line.events:
                rows[ev.name] += (ev.end_ns - ev.start_ns) / 1e6
                counts[ev.name] += 1
    return rows, counts


def categorize(name):
    if name.startswith("jit_"):
        return None
    if "attn" in name:
        return "flash-attn"
    if name.startswith("%ff"):
        return "pallas-ff"
    if "convert_reduce_fusion" in name:
        return "conv+gnstats"
    if "convolution" in name:
        return "conv-bare"
    if "copy-start" in name or "copy-done" in name or "copy." in name:
        return "copies"
    if "fusion" in name:
        return "fusion-other"
    if "bitcast" in name or "reshape" in name or "transpose" in name:
        return "layout"
    return "other"


def main():
    logdir = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rows, counts = parse_trace(logdir)
    cats = defaultdict(float)
    detail = defaultdict(list)
    for name, ms in rows.items():
        cat = categorize(name)
        if cat is None:
            continue
        cats[cat] += ms
        detail[cat].append((ms, counts[name], name))
    total = sum(cats.values())
    print(f"{'category':16s} {'ms/iter':>9s}")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{cat:16s} {ms/iters:9.3f}")
    print(f"{'TOTAL':16s} {total/iters:9.3f}  (sum of op durations)")
    for cat in ("conv+gnstats", "conv-bare", "fusion-other", "copies"):
        print(f"\n== {cat} ==")
        for ms, n, name in sorted(detail[cat], reverse=True)[:30]:
            print(f"{ms/iters:8.4f} ms x{n:3d}  {name[:130]}")


if __name__ == "__main__":
    main()
