#!/usr/bin/env python3
"""Assemble a three-point scaling curve (sf0.1 -> sf1.0 -> sf10) for the
scale-critical query subset and emit BENCH_SCALE_CURVE.json.

Usage: check_curve.py <curve_sf0.1.json> <curve_sf1.0.json> <curve_sf10.json> [out.json]

Each input is a graft.Bench one-line JSON from a SPARK_GRAFT_ONLY run
(min-of-3: ONLY mode re-runs every selected query each pass) at one
scale factor. Prints per query: the three times and the two
decade-over-decade ratios; flags any decade ratio above SUPERLINEAR
(15x for 10x data, same gate as check_scale.py).

The second decade (sf1.0 -> sf10) is the informative one: at sf0.1 many
queries are overhead-bound, so the first-decade ratio understates
growth; a query whose SECOND decade is ~10x is linear in the regime
where data actually dominates, and one whose second decade is well
under 10x still has overhead amortizing out.

Exit code: 0 always (reporting tool, not a gate).
"""
import json
import sys

SUPERLINEAR = 15.0


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return
    small, mid, big = (load(p) for p in sys.argv[1:4])
    sq, mq, bq = small["queries"], mid["queries"], big["queries"]
    rows = {}
    flagged = []
    for q in sorted(bq):
        if q not in sq or q not in mq:
            continue
        s, m, b = sq[q], mq[q], bq[q]
        r1 = m / s if s > 0 else float("inf")
        r2 = b / m if m > 0 else float("inf")
        rows[q] = {"sf0.1_sec": round(s, 3), "sf1.0_sec": round(m, 3),
                   "sf10_sec": round(b, 3),
                   "ratio_sf1.0/sf0.1": round(r1, 2),
                   "ratio_sf10/sf1.0": round(r2, 2)}
        mark = ""
        if r1 > SUPERLINEAR or r2 > SUPERLINEAR:
            flagged.append(q)
            mark = " <-- superlinear"
        print(f"{q:28s} {s:8.3f}s {m:8.3f}s {b:9.3f}s   "
              f"x{r1:6.2f} x{r2:6.2f}{mark}")
    second = sorted(r["ratio_sf10/sf1.0"] for r in rows.values())
    med2 = second[len(second) // 2] if second else 0.0
    print(f"\n=== {len(rows)} queries; second-decade median "
          f"{med2}x; {len(flagged)} over {SUPERLINEAR}x ===")
    if len(sys.argv) > 4:
        out = {
            "_doc": ("Three-point scaling curve sf0.1 -> sf1.0 -> sf10 "
                     "(100x total) for the scale-critical subset: dedup "
                     "(exact/minhash/simhash60/winnow/substring/corpus/"
                     "semantic), ANN (ivf/lsh-multi/topk), text scoring "
                     "(token_count/quality_score - the >10x band of "
                     "BENCH_SCALE.json), containment/decontamination, "
                     "training assembly (split/pack), and the TPC-H Q1 "
                     "scan-agg. Protocol: graft.Bench SPARK_GRAFT_ONLY "
                     "min-of-3 same-boot at each SF; sf1.0/sf10 data "
                     "from graft.cli.ScaleGen (10x/100x amplification "
                     "of the driver's sf0.1 with linear dup/ANN "
                     "statistics by construction). Flag threshold: "
                     f"either decade ratio > {SUPERLINEAR}."),
            "sf_dirs": [small.get("sf"), mid.get("sf"), big.get("sf")],
            "second_decade_median": med2,
            "superlinear_threshold": SUPERLINEAR,
            "flagged": flagged,
            "queries": rows,
        }
        with open(sys.argv[4], "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"wrote {sys.argv[4]}")


if __name__ == "__main__":
    main()
