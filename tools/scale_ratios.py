#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. sf0.1 vs sf1) and print a
per-query scaling table: min seconds at each SF, the ratio, and a flag
for anything scaling worse than the data ratio (superlinear suspect).

Usage: scale_ratios.py BASE.json SCALED.json [data_ratio]
"""
import json, sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

b, s = base["queries_min"], scaled["queries_min"]
rows = []
for q in sorted(b):
    if b.get(q) is None or s.get(q) is None:
        rows.append((q, b.get(q), s.get(q), None))
        continue
    rows.append((q, b[q], s[q], s[q] / b[q] if b[q] > 0 else None))

print(f"| query | {sys.argv[1].split('/')[-1]} min (s) | "
      f"{sys.argv[2].split('/')[-1]} min (s) | ratio |")
print("|---|---|---|---|")
flagged = []
for q, tb, ts, r in rows:
    rs = f"{r:.2f}x" if r is not None else "n/a"
    mark = ""
    if r is not None and r > data_ratio * 1.15 and ts > 0.5:
        mark = " **superlinear**"
        flagged.append((q, tb, ts, r))
    print(f"| {q} | {tb} | {ts} | {rs}{mark} |")

tot_b = sum(tb for _, tb, ts, r in rows if r is not None)
tot_s = sum(ts for _, tb, ts, r in rows if r is not None)
print(f"\ntotal (common queries): {tot_b:.2f}s -> {tot_s:.2f}s "
      f"({tot_s/tot_b:.2f}x at {data_ratio:.0f}x data)")
if flagged:
    print("\nflagged (ratio > data ratio * 1.15 and scaled time > 0.5s):")
    for q, tb, ts, r in flagged:
        print(f"  {q}: {tb}s -> {ts}s ({r:.2f}x)")
else:
    print("\nno superlinear suspects")
