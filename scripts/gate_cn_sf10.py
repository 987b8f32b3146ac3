#!/usr/bin/env python3
"""Bounded sf10 oracle for q_common_neighbors (VERDICT r11 #4).

The full oracle's wedge expansion streams ~8e9 rows into a 562M-group
aggregate — single-node DuckDB exhausted a 58 GiB temp cap twice (r11's
documented skip). This gate verifies the same Spark output WITHOUT that
aggregate, in two exact parts:

  1. FULL-SURFACE fingerprint over all candidate edges: the projection
     (doc_a, doc_b, deg_a, deg_b, trunc_nodes) — i.e. the pair set,
     both endpoint degrees, and the truncation audit — is compared via
     the same 1024-bucket hash-sum fingerprint check.py uses for the
     other 10^8-row outputs. Degrees and the pair set need only
     streaming aggregates, never the wedge.
  2. SAMPLED exact check of the wedge-derived columns: a hash-defined
     pair sample (~target 20k, the q_lsh_recall bounded-truth pattern)
     gets `common` and `cn_jaccard_ppm` recomputed exactly from the
     128-capped adjacency (row_number window over the staged pair
     frame, the same first-128-by-neighbor-id rule as the query) and
     compared row-for-row against Spark's values for those pairs.

Usage:
  python3 scripts/gate_cn_sf10.py <spark_out_dir> <sf_dir> [work_dir]

<spark_out_dir> = Verify's q_common_neighbors output dir; the pair
query SQL is read from <spark_out_dir>/../oracle_sql.json
(q_minhash_dedup — the declared candidate-pair oracle). Respects
GRAFT_DUCKDB_THREADS / GRAFT_DUCKDB_MEM / GRAFT_DUCKDB_TEMP.
"""
import glob
import json
import os
import sys

import duckdb

CAP = 128            # LlmOps.CnMaxDegree — keep in sync
SAMPLE_TARGET = 20000


def main():
    out_dir = sys.argv[1].rstrip("/")
    sf_dir = sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gate_cn_work"
    os.makedirs(work, exist_ok=True)
    con = duckdb.connect()
    for env, pragma in (("GRAFT_DUCKDB_THREADS", "threads"),
                        ("GRAFT_DUCKDB_MEM", "memory_limit"),
                        ("GRAFT_DUCKDB_TEMP", "max_temp_directory_size")):
        val = os.environ.get(env)
        if val:
            con.execute(f"SET {pragma} = '{val}'")
    con.execute(f"SET temp_directory = '{work}/.duck_tmp'")
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")

    oracle = json.load(open(os.path.join(
        os.path.dirname(out_dir), "oracle_sql.json")))
    pair_sql = oracle["q_minhash_dedup"]  # (doc_a, doc_b, n_shared_bands)

    spark_files = glob.glob(f"{out_dir}/*.parquet")
    assert spark_files, f"no Spark output under {out_dir}"
    con.execute("CREATE VIEW got AS SELECT * FROM "
                f"read_parquet({spark_files!r})")

    # -- stage the candidate pair frame ONCE (the heavy band self-join)
    pairs_pq = f"{work}/cn_pairs.parquet"
    if not os.path.exists(pairs_pq):
        print("# staging candidate pairs ...", flush=True)
        con.execute(f"COPY (SELECT doc_a, doc_b FROM ({pair_sql})) "
                    f"TO '{pairs_pq}' (FORMAT PARQUET)")
    con.execute(f"CREATE VIEW pairs AS SELECT * FROM read_parquet('{pairs_pq}')")
    con.execute("CREATE VIEW und AS SELECT doc_a AS u, doc_b AS v FROM pairs "
                "UNION ALL SELECT doc_b, doc_a FROM pairs")
    n_pairs = con.execute("SELECT count(*) FROM pairs").fetchone()[0]
    n_got = con.execute("SELECT count(*) FROM got").fetchone()[0]
    print(f"# pairs={n_pairs} spark_rows={n_got}", flush=True)
    if n_pairs != n_got:
        print(f"[NROWS] q_common_neighbors: spark={n_got} oracle={n_pairs}")
        sys.exit(1)

    con.execute("CREATE TEMP TABLE deg AS "
                "SELECT u AS node, CAST(count(*) AS BIGINT) AS deg "
                "FROM und GROUP BY 1")
    trunc = con.execute(
        f"SELECT CAST(sum(CASE WHEN deg > {CAP} THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM deg").fetchone()[0]

    # -- part 1: full-surface fingerprint of the degree projection
    def fp(q):
        cols = '"doc_a", "doc_b", "deg_a", "deg_b", "trunc_nodes"'
        return (f"SELECT hash({cols}) % 1024 AS b, count(*) AS n, "
                f"CAST(sum(hash({cols}) % 1000000007) AS HUGEINT) AS s "
                f"FROM ({q}) GROUP BY 1")

    want_deg = (f"SELECT p.doc_a, p.doc_b, da.deg AS deg_a, db.deg AS deg_b, "
                f"CAST({trunc} AS BIGINT) AS trunc_nodes "
                f"FROM pairs p JOIN deg da ON da.node = p.doc_a "
                f"JOIN deg db ON db.node = p.doc_b")
    got_deg = ("SELECT CAST(doc_a AS BIGINT) AS doc_a, "
               "CAST(doc_b AS BIGINT) AS doc_b, "
               "CAST(deg_a AS BIGINT) AS deg_a, CAST(deg_b AS BIGINT) AS deg_b, "
               "CAST(trunc_nodes AS BIGINT) AS trunc_nodes FROM got")
    bad = con.execute(
        f"SELECT count(*) FROM (({fp(got_deg)} EXCEPT {fp(want_deg)}) "
        f"UNION ALL ({fp(want_deg)} EXCEPT {fp(got_deg)}))").fetchone()[0]
    if bad:
        print(f"[DIFF ] q_common_neighbors degrees: {bad} fingerprint "
              "buckets differ")
        sys.exit(1)
    print(f"[OK   ] q_common_neighbors degree surface: {n_got} rows "
          "(1024-bucket hash-sum fingerprint over doc_a, doc_b, deg_a, "
          "deg_b, trunc_nodes)", flush=True)

    # -- part 2: sampled exact wedge check
    mod = max(1, n_pairs // SAMPLE_TARGET)
    pred = f"hash(doc_a, doc_b) % {mod} = 0"
    con.execute(f"CREATE TEMP TABLE s AS SELECT doc_a, doc_b FROM pairs "
                f"WHERE {pred}")
    n_s = con.execute("SELECT count(*) FROM s").fetchone()[0]
    print(f"# sampled pairs: {n_s} (every {mod}th by pair hash)", flush=True)

    # capped adjacency: first CAP neighbors by ascending id — the
    # query's exact rule (row_number over (partition by u order by v))
    con.execute("CREATE TEMP TABLE uc AS "
                "SELECT u AS m, v AS n FROM ("
                "  SELECT u, v, row_number() OVER "
                "    (PARTITION BY u ORDER BY v) AS rn FROM und) "
                f"WHERE rn <= {CAP}")

    want_s = f"""
      WITH w AS (
        SELECT s.doc_a, s.doc_b, CAST(count(*) AS BIGINT) AS common
        FROM uc u1 JOIN s ON u1.n = s.doc_a
        JOIN uc u2 ON u2.m = u1.m AND u2.n = s.doc_b
        GROUP BY 1, 2)
      SELECT s.doc_a, s.doc_b,
             COALESCE(w.common, 0) AS common, da.deg AS deg_a,
             db.deg AS deg_b,
             CASE WHEN da.deg + db.deg - 2 - COALESCE(w.common, 0) > 0
                  THEN 1000000 * COALESCE(w.common, 0)
                       // (da.deg + db.deg - 2 - COALESCE(w.common, 0))
                  ELSE 0 END AS cn_jaccard_ppm,
             CAST({trunc} AS BIGINT) AS trunc_nodes
      FROM s JOIN deg da ON da.node = s.doc_a
      JOIN deg db ON db.node = s.doc_b
      LEFT JOIN w ON w.doc_a = s.doc_a AND w.doc_b = s.doc_b"""
    got_s = (f"SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) "
             f"AS doc_b, CAST(common AS BIGINT) AS common, "
             f"CAST(deg_a AS BIGINT) AS deg_a, CAST(deg_b AS BIGINT) AS deg_b, "
             f"CAST(cn_jaccard_ppm AS BIGINT) AS cn_jaccard_ppm, "
             f"CAST(trunc_nodes AS BIGINT) AS trunc_nodes "
             f"FROM got WHERE {pred}")
    diff = con.execute(
        f"SELECT count(*) FROM (({got_s} EXCEPT ALL ({want_s})) "
        f"UNION ALL (({want_s}) EXCEPT ALL {got_s}))").fetchone()[0]
    if diff:
        print(f"[DIFF ] q_common_neighbors sampled wedge: {diff} rows differ")
        ex = con.execute(
            f"SELECT * FROM ({got_s} EXCEPT ALL ({want_s})) LIMIT 3").fetchall()
        print("        spark-only examples:", ex)
        sys.exit(1)
    print(f"[OK   ] q_common_neighbors sampled wedge: {n_s} pairs exact "
          "(common, deg_a, deg_b, cn_jaccard_ppm, trunc_nodes)")
    print(f"\n2 ok, 0 fail (full degree surface fingerprint + "
          f"{n_s}-pair exact wedge sample of {n_pairs} candidate edges)")


if __name__ == "__main__":
    main()
