#!/usr/bin/env python3
"""Compare this round's close bench against the driver's pre-round run
(plans/r12/bench_r12_driver_before.json).  Prints per-query deltas for
everything ≥ 0.5 s or ≥ 1.3× either way, plus family and total summaries.

Usage: python scripts/opt_r12_compare.py [after.json] [before.json]
"""

from __future__ import annotations

import json
import math
import sys

AFTER = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_full.json"
BEFORE = (
    sys.argv[2]
    if len(sys.argv) > 2
    else "/root/repo/plans/r12/bench_r12_driver_before.json"
)

a = json.load(open(AFTER))
b = json.load(open(BEFORE))
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
print(f"common {len(common)}  before-only {sorted(set(qb)-set(qa))}  "
      f"after-only {sorted(set(qa)-set(qb))}")
print(f"load before-run: {b.get('load')}\nload after-run:  {a.get('load')}")

tot_b = sum(qb[q] for q in common)
tot_a = sum(qa[q] for q in common)
logs = [math.log(qb[q] / qa[q]) for q in common if qa[q] > 0 and qb[q] > 0]
geo = math.exp(sum(logs) / len(logs))
print(f"\ntotal (common): {tot_b:.1f} -> {tot_a:.1f} s "
      f"({tot_b / tot_a:.3f}x)   geomean speedup {geo:.3f}x")

rows = []
for q in common:
    d = qb[q] - qa[q]
    r = qb[q] / qa[q] if qa[q] else float("inf")
    if abs(d) >= 0.5 or r >= 1.3 or r <= 1 / 1.3:
        rows.append((d, q, qb[q], qa[q], r))
rows.sort(reverse=True)
print("\nmovers (Δ≥0.5s or ratio≥1.3 either way):")
for d, q, vb, va, r in rows:
    print(f"  {q:34s} {vb:7.2f} -> {va:7.2f}  ({r:5.2f}x, {d:+.2f}s)")
