#!/usr/bin/env python3
"""Same-round perf regression gate: compare a fresh bench run against
the COMMITTED record and fail (exit 1) when any common query regressed
more than the gate factor.

Usage:
    python3 tools/bench_gate.py [fresh.json] [committed.json] [gate]

Defaults: fresh = bench_out.json, committed = the newest BENCH_r*.json
in the repo root, gate = 1.5.

Both runs must come from the SAME machine state (idle box, same CPUS,
same SF) — per SURVEY §9.6, cross-round/cross-box per-query deltas on
iterative queries are dominated by the environment and are NOT
regressions. This gate is for the commit-time loop: run the bench,
run the gate, only then refresh the committed record.

Small absolute times are noise-banded: a query under min_abs seconds
(default 0.5) can double without meaning anything, so it must ALSO
exceed the committed time by min_abs before it flags.
"""
import glob
import json
import os
import re
import sys


def newest_committed(root="."):
    recs = glob.glob(os.path.join(root, "BENCH_r*.json"))
    if not recs:
        sys.exit("no BENCH_r*.json committed record found")
    return max(recs, key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)))


def main(argv):
    fresh_p = argv[1] if len(argv) > 1 else "bench_out.json"
    committed_p = argv[2] if len(argv) > 2 else newest_committed()
    gate = float(argv[3]) if len(argv) > 3 else 1.5
    min_abs = float(os.environ.get("BENCH_GATE_MIN_ABS", "0.5"))

    fresh = json.load(open(fresh_p))
    committed = json.load(open(committed_p))
    fq, cq = fresh["queries"], committed["queries"]

    common = sorted(set(fq) & set(cq))
    if not common:
        sys.exit(f"no overlapping queries between {fresh_p} and {committed_p}")

    regressed = []
    for q in common:
        c, f = cq[q], fq[q]
        ratio = f / max(c, 1e-9)
        if ratio > gate and (f - c) > min_abs:
            regressed.append((ratio, c, f, q))

    new_err = sorted(set(fresh.get("errors", {})) - set(committed.get("errors", {})))

    print(f"gate {gate}x over {committed_p} ({len(common)} common queries, "
          f"min_abs {min_abs}s)")
    # a UNIFORM shift is the environment, not code (SURVEY 9.6): when the
    # median itself moved and most queries sit near it, say so up front
    ratios = sorted(fq[q] / max(cq[q], 1e-9) for q in common)
    med = ratios[len(ratios) // 2]
    near_med = sum(1 for r in ratios if med * 0.8 <= r <= med * 1.25)
    if med > 1.15 and near_med * 2 >= len(ratios):
        print(f"NOTE: shift looks uniform (median {med:.2f}x, "
              f"{near_med}/{len(ratios)} queries within 25% of it) — suspect "
              "the environment; run a same-box A/B (SURVEY 9.6) before "
              "treating these as code regressions")
    if regressed:
        regressed.sort(reverse=True)
        print(f"{'ratio':>7} {'committed':>10} {'fresh':>8}  query")
        for ratio, c, f, q in regressed:
            print(f"{ratio:7.2f} {c:10.2f} {f:8.2f}  {q}  <-- REGRESSED")
    if new_err:
        print(f"NEW ERRORS (absent from committed record): {', '.join(new_err)}")
    if regressed or new_err:
        print(f"FAIL: {len(regressed)} regression(s), {len(new_err)} new error(s)")
        return 1
    tot_c = sum(cq[q] for q in common)
    tot_f = sum(fq[q] for q in common)
    print(f"OK: no query over the gate; common-query total "
          f"{tot_c:.1f}s -> {tot_f:.1f}s ({tot_f / max(tot_c, 1e-9):.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
