#!/usr/bin/env python3
"""Merge new per-query parity rows into CORRECTNESS_SCALE_SF10.json.

Usage: merge_scale_sf10.py <new_rows.json> [<new_rows.json> ...]

Each input is a check_parity.py JSON artifact ({name: {rows_match,...}}
or the {_doc, sf_dir, queries:{...}} wrapper). Existing entries are
overwritten only by rows that carry a non-null verdict (a batch that
skipped a query never erases a previous result). The _doc line is
updated to describe the widened coverage.
"""
import json
import sys

TARGET = "CORRECTNESS_SCALE_SF10.json"


def rows_of(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d and isinstance(d["queries"], dict) \
        else {k: v for k, v in d.items() if k.startswith("q_")}


def main(paths):
    with open(TARGET) as f:
        out = json.load(f)
    added, updated = 0, 0
    for p in paths:
        for name, row in rows_of(p).items():
            if row.get("hash_match") is None and row.get("err") is None:
                continue
            if name in out["queries"]:
                updated += 1
            else:
                added += 1
            out["queries"][name] = row
    n = len(out["queries"])
    green = sum(1 for r in out["queries"].values() if r.get("hash_match"))
    out["_doc"] = (
        f"sf10 oracle gate (round 13 curve subset, widened in round 14 to "
        f"the kafka-wire / delta-and-sink / stateful-streaming / ANN / "
        f"multimodal families the curve skipped): {n} queries dumped by "
        f"graft.Verify at /root/repo/target/sf10 (cli.ScaleGen 100x "
        f"amplification) and compared against DuckDB per query "
        f"(tools/check_parity.py with PARITY_MEMORY/PARITY_ONLY batching). "
        f"{green}/{n} hash-green; q_semantic_dedup is verified by the "
        f"invariant audit (tools/check_semdedup.py over "
        f"graft.cli.SemDedupAudit exports — see its err field).")
    with open(TARGET, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"merged: +{added} new, {updated} updated -> {n} queries, "
          f"{green} hash-green")


if __name__ == "__main__":
    main(sys.argv[1:])
