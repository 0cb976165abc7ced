#!/usr/bin/env python3
"""Invariant-based verification for q_semantic_dedup at scale factors
where the SQL oracle is resource-intractable (DuckDB cannot re-derive
the k-means assignment relation at sf10 without re-running Lloyd in
SQL). Consumes the relations exported by graft.cli.SemDedupAudit and
audits the query's CONTRACT over the raw vectors:

  A. membership parity (FULL):    result.n_members == count(assign) per cid
  B. dropped parity (FULL):       result.n_dups   == count(dropped) per cid,
                                  plus sum(n_members) == corpus rows and
                                  result cids == centroid cids == k
  C. pair relation (SAMPLED cids): DuckDB recomputes the >= tau pair
     relation from raw vectors within each sampled cluster; n_pairs must
     match exactly and the dropped SET must be identical
  D. nearest-centroid (SAMPLED vecs): each sampled vector's assigned
     centroid has cosine >= every other centroid's cosine - 1e-9
     (tolerance absorbs cross-engine last-ulp fold noise; the engine's
     returned assignment is computed against the returned centroids,
     so the invariant is exact on the engine side)

Usage: check_semdedup.py <auditDir> <sfDir> [out.json]
Env:   SEM_CID_SAMPLE (default 41)  - check clusters with cid % N == 0
       SEM_VEC_SAMPLE (default 199) - check vectors with id % N == 0
       (set both to 1 for a full audit at small SFs)
       PARITY_MEMORY / PARITY_TEMP  - same DuckDB caps as check_parity

Exit 0 iff every invariant holds.
"""
import json
import os
import sys

import duckdb

TAU = 0.4
TOL = 1e-9


def main(audit_dir: str, sf_dir: str, json_out: str = None) -> int:
    cid_mod = int(os.environ.get("SEM_CID_SAMPLE", "41"))
    vec_mod = int(os.environ.get("SEM_VEC_SAMPLE", "199"))
    con = duckdb.connect()
    if os.environ.get("PARITY_MEMORY"):
        con.execute(f"SET memory_limit='{os.environ['PARITY_MEMORY']}'")
    if os.environ.get("PARITY_TEMP") is not None:
        con.execute(f"SET temp_directory='{os.environ['PARITY_TEMP']}'")
    con.execute(f"""
        CREATE VIEW emb AS SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[]))) AS nrm
        FROM read_parquet('{sf_dir}/embeddings.parquet');
        CREATE VIEW assign AS SELECT * FROM
          read_parquet('{audit_dir}/assign.parquet/*.parquet');
        CREATE VIEW cent AS SELECT cid, cv,
          sqrt(list_dot_product(cv, cv)) AS cnrm FROM
          read_parquet('{audit_dir}/centroids.parquet/*.parquet');
        CREATE VIEW dropped AS SELECT * FROM
          read_parquet('{audit_dir}/dropped.parquet/*.parquet');
        CREATE VIEW result AS SELECT * FROM
          read_parquet('{audit_dir}/result.parquet/*.parquet');
    """)
    report = {"tau": TAU, "cid_sample_mod": cid_mod, "vec_sample_mod": vec_mod}
    ok = True

    def check(name, bad_count, detail):
        nonlocal ok
        passed = bad_count == 0
        ok = ok and passed
        report[name] = {"pass": passed, "violations": bad_count, **detail}
        print(f"[{'ok' if passed else 'FAIL'}] {name}: "
              f"{bad_count} violations ({detail})")

    # A. membership parity, every cluster
    n_bad = con.execute("""
        SELECT count(*) FROM result r
        FULL JOIN (SELECT cid, count(*) AS n FROM assign GROUP BY cid) a
          USING (cid)
        WHERE r.n_members IS DISTINCT FROM a.n
    """).fetchone()[0]
    k, corpus, total_members = con.execute("""
        SELECT (SELECT count(*) FROM cent),
               (SELECT count(*) FROM emb),
               (SELECT sum(n_members) FROM result)
    """).fetchone()
    check("A_membership", n_bad, {"k": k, "corpus": corpus})
    if int(total_members) != int(corpus):
        check("A_total", 1, {"sum_n_members": int(total_members),
                             "corpus": int(corpus)})

    # B. dropped parity, every cluster
    n_bad = con.execute("""
        SELECT count(*) FROM result r
        LEFT JOIN (SELECT cid, count(*) AS n FROM dropped GROUP BY cid) d
          USING (cid)
        WHERE r.n_dups IS DISTINCT FROM coalesce(d.n, 0)
    """).fetchone()[0]
    check("B_dropped_counts", n_bad, {})

    # C. sampled clusters: recompute the pair relation from raw vectors
    con.execute(f"""
        CREATE TEMP TABLE sm AS
        SELECT a.cid, e.vec_id, e.v, e.nrm
        FROM assign a JOIN emb e ON a.id = e.vec_id
        WHERE a.cid % {cid_mod} = 0
    """)
    sampled_cids, sampled_rows = con.execute(
        "SELECT count(DISTINCT cid), count(*) FROM sm").fetchone()
    n_bad = con.execute(f"""
        WITH pr AS (
          SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
          FROM sm a JOIN sm b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {TAU}),
        agg AS (SELECT cid, count(*) AS n_pairs,
                       count(DISTINCT id_b) AS n_dups FROM pr GROUP BY cid)
        SELECT count(*) FROM result r
        LEFT JOIN agg USING (cid)
        WHERE r.cid % {cid_mod} = 0
          AND (r.n_pairs IS DISTINCT FROM coalesce(agg.n_pairs, 0)
            OR r.n_dups IS DISTINCT FROM coalesce(agg.n_dups, 0))
    """).fetchone()[0]
    check("C_pair_counts", n_bad,
          {"clusters": sampled_cids, "vectors": sampled_rows})
    # dropped SET equality on the sampled clusters (both directions)
    n_bad = con.execute(f"""
        WITH pr AS (
          SELECT a.cid, b.vec_id AS id_b
          FROM sm a JOIN sm b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {TAU}),
        rec AS (SELECT DISTINCT cid, id_b AS vec_id FROM pr),
        eng AS (SELECT cid, vec_id FROM dropped WHERE cid % {cid_mod} = 0)
        SELECT (SELECT count(*) FROM rec ANTI JOIN eng USING (cid, vec_id))
             + (SELECT count(*) FROM eng ANTI JOIN rec USING (cid, vec_id))
    """).fetchone()[0]
    check("C_dropped_set", n_bad, {"clusters": sampled_cids})

    # D. sampled vectors are assigned to their nearest centroid
    n_bad, n_sampled = con.execute(f"""
        WITH sv AS (
          SELECT a.cid, e.vec_id, e.v, e.nrm
          FROM assign a JOIN emb e ON a.id = e.vec_id
          WHERE e.vec_id % {vec_mod} = 0),
        best AS (
          SELECT sv.vec_id, sv.cid AS assigned,
            max(list_dot_product(sv.v, c.cv) / (sv.nrm * c.cnrm)) AS best_cos,
            max(CASE WHEN c.cid = sv.cid
                THEN list_dot_product(sv.v, c.cv) / (sv.nrm * c.cnrm) END)
              AS own_cos
          FROM sv CROSS JOIN cent c GROUP BY sv.vec_id, sv.cid)
        SELECT count(*) FILTER (WHERE own_cos < best_cos - {TOL}), count(*)
        FROM best
    """).fetchone()
    check("D_nearest_centroid", n_bad, {"vectors": n_sampled})

    report["pass"] = ok
    print(f"=== q_semantic_dedup invariants: {'PASS' if ok else 'FAIL'} ===")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
