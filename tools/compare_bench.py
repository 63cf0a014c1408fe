#!/usr/bin/env python3
"""Scale-bench comparison (dev tool): per-query ratio of a scaled bench
run vs the sf0.1 record, flagging super-linear outliers.

Usage: python3 tools/compare_bench.py <base.json> <scaled.json> [ratio_gate]

The gate (default 15: 10x data + scheduling overhead headroom) marks
queries whose time grew more than ratio_gate x over the base run.
"""
import json, sys

base_p, scaled_p = sys.argv[1], sys.argv[2]
gate = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

base = json.load(open(base_p))["queries"]
scaled = json.load(open(scaled_p))["queries"]

rows = []
only_scaled = []
for q in sorted(scaled):
    if q not in base:
        only_scaled.append(q)
        continue
    b, s = base[q], scaled[q]
    rows.append((s / max(b, 1e-9), b, s, q))

if not rows:
    sys.exit(f"no overlapping queries between {base_p} and {scaled_p}")
if only_scaled:
    print(f"NOTE: {len(only_scaled)} queries only in the scaled run "
          f"(not compared): {', '.join(only_scaled)}")

rows.sort(reverse=True)
flagged = [r for r in rows if r[0] > gate]
print(f"{'ratio':>7} {'sf0.1':>8} {'sf1':>8}  query")
for ratio, b, s, q in rows[:20]:
    mark = " <-- OVER GATE" if ratio > gate else ""
    print(f"{ratio:7.1f} {b:8.2f} {s:8.2f}  {q}{mark}")
tot_b = sum(r[1] for r in rows)
tot_s = sum(r[2] for r in rows)
print(f"\ntotal: sf0.1 {tot_b:.1f}s -> sf1 {tot_s:.1f}s ({tot_s/tot_b:.1f}x on 10x data)")
print(f"{len(flagged)} queries over the {gate:.0f}x gate")
# gate failures must fail the caller (CI, scripts) — a printed table alone
# let over-gate regressions pass silently
sys.exit(1 if flagged else 0)
