#!/usr/bin/env python3
"""Diff a bench run against the canonical per-query baseline.

Usage: check_bench.py <BENCH_json> [BASELINE_BENCH.json]

<BENCH_json> is either graft.Bench's own one-line JSON (BENCH_FULL.json)
or a driver round file whose 'tail' embeds that line. Reports, per
query: time, baseline, ratio; flags ratios > 2.0.

Since round 9, graft.Bench self-adjudicates: each reported time is
already the min over up to SPARK_GRAFT_PASSES (default 3) same-boot
runs — pass 1 runs alphabetically, then queries over 1.5x baseline are
re-run in reversed order and the min wins (samples recorded under
'reruns' in BENCH_FULL.json). So a >2x flag from a round-9+ bench
survived min-of-N isolated attempts and IS a regression verdict, not a
lead. For pre-round-9 single-pass files the old caveat applies:
cross-boot single samples swing 3-4x; confirm with isolated
SPARK_GRAFT_ONLY runs before calling a flag a regression.

Exit code: 0 always (reporting tool, not a gate); the judge applies the
gate to confirmed numbers.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    t = d.get("tail", "")
    out = {}
    for k, v in re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+)', t):
        out.setdefault(k, float(v))
    return out


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return
    bench = load_queries(sys.argv[1])
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_BENCH.json"
    with open(base_path) as f:
        base = json.load(f)["queries"]
    flagged, missing = [], []
    for q in sorted(bench):
        v = bench[q] if isinstance(bench[q], (int, float)) else bench[q]["sec"]
        if q not in base:
            missing.append(q)
            continue
        b = base[q]["sec"]
        ratio = v / b if b > 0 else float("inf")
        mark = " <-- >2x" if ratio > 2.0 else ""
        if ratio > 2.0:
            flagged.append((q, v, b, ratio))
        print(f"{q:40s} {v:8.3f}s  base {b:8.3f}s (r{base[q]['round']})  {ratio:5.2f}x{mark}")
    print(f"\n=== {len(flagged)} queries over 2x of baseline, "
          f"{len(missing)} unbaselined ===")
    for q, v, b, r in flagged:
        print(f"  {q}: {v:.3f}s vs {b:.3f}s = {r:.2f}x")
    if missing:
        print("  unbaselined (add to BASELINE_BENCH.json on their first run): "
              + ", ".join(missing))


if __name__ == "__main__":
    main()
