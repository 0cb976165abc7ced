#!/usr/bin/env python3
"""Compute per-query scaling ratios between two bench runs and emit
BENCH_SCALE.json.

Usage: check_scale.py <BENCH_sf1.0.json> <BENCH_sf0.1.json> [out.json]

Both inputs are graft.Bench one-line JSON files ({"metric":"total",
"queries":{...},...}), run with the same binary on the same boot at two
scale factors. Prints, per query: sf1.0 time, sf0.1 time, ratio; flags
ratios above SUPERLINEAR (default 15x for 10x data — linear scaling
with some fixed-overhead amortization lands well under 10x, so a >15x
query is growing faster than its input and needs a plan re-audit).

Writes the full table (plus the flag list) as JSON for check-in as
BENCH_SCALE.json.

Ratio semantics at these sizes: sf0.1 is 17 MB, so many catalog
queries are OVERHEAD-bound (fixed per-query cost >> data cost) and
show ratios near 1x at 10x data; that is a fine outcome, not
suspicious. The gate is one-sided: only superlinear growth is a flag.

Exit code: 0 always (reporting tool, not a gate).
"""
import json
import sys

SUPERLINEAR = 15.0


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return
    big = load(sys.argv[1])
    small = load(sys.argv[2])
    bq, sq = big["queries"], small["queries"]

    def sec(v):
        return v if isinstance(v, (int, float)) else v["sec"]

    rows = {}
    flagged = []
    for q in sorted(bq):
        if q not in sq:
            continue
        b, s = sec(bq[q]), sec(sq[q])
        ratio = b / s if s > 0 else float("inf")
        rows[q] = {"sf1.0_sec": round(b, 3), "sf0.1_sec": round(s, 3),
                   "ratio": round(ratio, 2)}
        mark = " <-- superlinear" if ratio > SUPERLINEAR else ""
        if ratio > SUPERLINEAR:
            flagged.append(q)
        print(f"{q:40s} sf1.0 {b:8.3f}s  sf0.1 {s:8.3f}s  {ratio:6.2f}x{mark}")

    ratios = sorted(r["ratio"] for r in rows.values())
    med = ratios[len(ratios) // 2] if ratios else 0.0
    print(f"\n=== {len(rows)} queries; total sf1.0 {big.get('value')}s vs "
          f"sf0.1 {small.get('value')}s; median ratio {med}x; "
          f"{len(flagged)} over {SUPERLINEAR}x ===")
    for q in flagged:
        print(f"  {q}")

    if len(sys.argv) > 3:
        out = {
            "_doc": ("Per-query sf1.0/sf0.1 scaling ratios (10x data). "
                     "Both runs: graft.Bench min-of-N same-boot on this "
                     "box, same binary. sf1.0 data derived from the "
                     "driver's sf0.1 by graft.cli.ScaleGen (replica "
                     "cloning with key-space shifting, per-replica "
                     "vocabulary bijection for text, fresh gaussians "
                     "for embeddings - see its scaladoc for why dup/ANN "
                     "statistics scale linearly by construction). "
                     f"Flag threshold: ratio > {SUPERLINEAR} "
                     "(superlinear for 10x data)."),
            "sf_big": big.get("sf"),
            "sf_small": small.get("sf"),
            "total_sf1.0_sec": big.get("value"),
            "total_sf0.1_sec": small.get("value"),
            "median_ratio": med,
            "superlinear_threshold": SUPERLINEAR,
            "flagged": flagged,
            "queries": rows,
        }
        with open(sys.argv[3], "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"wrote {sys.argv[3]}")


if __name__ == "__main__":
    main()
