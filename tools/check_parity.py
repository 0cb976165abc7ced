#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_parity.py <verify_out_dir> <sf_dir> [out.json]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and diffs values column-by-column (sorted columns, sorted rows).

With a third argument, also writes a per-query JSON artifact in the
driver's CORRECTNESS_r{N}.json schema (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err) so scale-factor parity runs
can be checked in alongside the per-round sf0.01 files.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware → naive UTC, and floats to stable repr
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    # polite mode for runs concurrent with a timing-sensitive bench
    threads = os.environ.get("PARITY_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    # bound DuckDB's footprint for scale-factor runs (it spills to
    # temp instead of eating the box; an sf10 oracle self-join peaked
    # >80 GB resident without this)
    memcap = os.environ.get("PARITY_MEMORY")
    if memcap:
        con.execute(f"SET memory_limit='{memcap}'")
    # opt-in spill dir: WITHOUT it a query over the memory limit fails
    # fast with an out-of-memory error instead of silently filling the
    # disk with tens of GB of temp blocks (which an sf10 minhash-pairs
    # oracle did — the engine computes the same relation in seconds,
    # the set-based SQL re-derivation materializes it)
    # (PARITY_TEMP='' disables spilling entirely: over-limit queries
    # fail fast with OOM instead of writing temp blocks)
    if os.environ.get("PARITY_TEMP") is not None:
        con.execute(f"SET temp_directory='{os.environ['PARITY_TEMP']}'")
    # restrict to a comma-separated query subset (batching scale runs)
    only = os.environ.get("PARITY_ONLY")
    only_set = set(only.split(",")) if only else None
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    report = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only_set is not None and name not in only_set:
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        want = con.execute(oracle[name]).df()
        g, w = norm(got), norm(want)
        report[name] = {"rows_match": len(g) == len(w),
                        "schema_match": list(g.columns) == list(w.columns),
                        "hash_match": False, "spark_rows": len(g),
                        "oracle_rows": len(w), "err": None}
        if list(g.columns) != list(w.columns):
            print(f"[FAIL-cols] {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL-rows] {name}: spark={len(g)} duckdb={len(w)}")
            failures += 1
            continue
        bad_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = ((a.astype(float) == b.astype(float)) |
                          (a.isna() & b.isna())).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
            except Exception as ex:
                eq = False
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"[FAIL-vals] {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                mism = (g[c].astype(str) != w[c].astype(str))
                idx = mism[mism].index[:3]
                for i in idx:
                    print(f"    row {i} col {c}: spark={g[c][i]!r} duckdb={w[c][i]!r}")
            failures += 1
        else:
            report[name]["hash_match"] = True
            print(f"[ok] {name}: {len(g)} rows")
    print(f"=== {failures} failures ===")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
