#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

GRAFT_SKIP=q_a,q_b skips named queries.

Reads each <out_dir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the sf_dir
tables, sorts columns by name, and compares values row by row.

q_dedup_clusters and q_cluster_stats get special handling at bench
scale (documents > 1000 rows): the declared single-statement oracles'
recursive closure is quadratic in component size — fine at the
driver's sf0.01 gate, hangs at sf0.1+ — so check.py recomputes the
same answer with an iterative temp-table min-label loop (diameter
rounds, linear state), seeded from the declared q_minhash_dedup
oracle so the pair semantics can't drift; cluster_stats is the size
histogram over those labels (the declared oracle's own tail). At
gate SFs the declared SQL runs as-is, keeping this script a faithful
replica of what the driver executes.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def iterative_cc_oracle(con, oracle):
    """q_dedup_clusters as an iterative DuckDB min-label loop.

    Same answer as the declared recursive-CTE oracle, but per-round
    state is one row per node instead of the transitive closure:
    temp tables hold (id, lbl); each round takes the min over
    neighbors' labels until a fixed point (diameter rounds)."""
    pairs_sql = oracle["q_minhash_dedup"]  # (doc_a, doc_b, n_shared_bands)
    con.execute("DROP TABLE IF EXISTS cc_sym")
    con.execute(f"""
        CREATE TEMP TABLE cc_sym AS
        WITH p AS ({pairs_sql})
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p""")
    con.execute("DROP TABLE IF EXISTS cc_lbl")
    con.execute("""
        CREATE TEMP TABLE cc_lbl AS
        SELECT u AS id, least(u, min(v)) AS lbl FROM cc_sym GROUP BY u""")
    for _ in range(200):
        con.execute("DROP TABLE IF EXISTS cc_next")
        con.execute("""
            CREATE TEMP TABLE cc_next AS
            SELECT l.id, least(l.lbl, coalesce(min(nb.lbl), l.lbl)) AS lbl
            FROM cc_lbl l
            LEFT JOIN cc_sym e ON e.v = l.id
            LEFT JOIN cc_lbl nb ON nb.id = e.u
            GROUP BY l.id, l.lbl""")
        changed = con.execute("""
            SELECT count(*) FROM cc_next n JOIN cc_lbl o USING (id)
            WHERE n.lbl < o.lbl""").fetchone()[0]
        con.execute("DROP TABLE cc_lbl")
        con.execute("ALTER TABLE cc_next RENAME TO cc_lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError("iterative CC oracle did not converge")
    return con.execute("""
        SELECT id AS doc_id, CAST(lbl AS BIGINT) AS cluster_id
        FROM cc_lbl ORDER BY doc_id""").fetch_arrow_table()


def iterative_cluster_stats_oracle(con, oracle):
    """q_cluster_stats via the same iterative labels: the declared
    oracle's tail (cluster-size histogram) over iterative_cc_oracle's
    cc_lbl instead of the recursive closure's labels — identical by
    the same least-label fixed point."""
    iterative_cc_oracle(con, oracle)  # (re)builds cc_lbl
    return con.execute("""
        SELECT csize, count(*) AS n_clusters,
               CAST(sum(csize) AS BIGINT) AS n_docs
        FROM (SELECT lbl, count(*) AS csize FROM cc_lbl GROUP BY lbl)
        GROUP BY csize ORDER BY csize""").fetch_arrow_table()


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def materialize_ctes(sql):
    """Execution-hint rewrite: WITH x AS (...) -> AS MATERIALIZED (...).

    DuckDB inlines CTEs by default; a chain where level K references
    level K-1 twice (q_kcenter_select's 8 greedy rounds) re-executes
    exponentially — 2^8 copies of the base scan blew a 26 GiB memory
    cap at 200 k embeddings, while the MATERIALIZED form runs each
    level once and finishes in seconds. Semantics are unchanged, so
    OOM-failed oracles are retried once through this rewrite.

    Only CTE heads are rewritten: the body must open with a query
    keyword (SELECT/WITH/VALUES). A bare `\bAS \(` also matched DuckDB
    named-window clauses — `WINDOW w AS (PARTITION BY ...)` — turning
    the OOM retry into a syntax error for every oracle using one
    (ADVICE r12); window specs open with PARTITION/ORDER/ROWS/RANGE,
    never a query keyword, so the lookahead separates them exactly."""
    import re
    return re.sub(r"\bAS \((\s*)(?=SELECT\b|WITH\b|VALUES\b)",
                  r"AS MATERIALIZED (\1", sql, flags=re.IGNORECASE)


def is_oom(e):
    s = str(e)
    return "Out of Memory" in s or "max_temp_directory_size" in s


def force_materialize():
    """GRAFT_MATERIALIZE=1 applies the CTE-materialization rewrite to
    every oracle UP FRONT (sf10 gate runs: a chained multi-reference
    CTE like the bucket-BFS reach oracle inlines to ~30 copies of its
    base CTE — not an OOM, just a pointless 30x recompute the retry
    path never sees)."""
    return os.environ.get("GRAFT_MATERIALIZE") == "1"


def run_oracle(con, sql):
    """Oracle exec with the one-shot MATERIALIZED retry on OOM."""
    if force_materialize():
        sql = materialize_ctes(sql)
    try:
        return con.execute(sql).fetch_arrow_table()
    except Exception as e:
        if not is_oom(e):
            raise
        return con.execute(materialize_ctes(sql)).fetch_arrow_table()


def sql_multiset_equal(con, files, name, want_view):
    """Large-result compare (sf10 gates): the row-by-row Python loop
    materializes every value and dies on 10^7+-row outputs, so above
    SQLCMP_ROWS the multiset equality runs INSIDE DuckDB — EXCEPT ALL
    both ways over canonically-cast projections (ints → BIGINT unless
    the other side is floating/decimal, then both → DOUBLE; matching
    norm()'s coercions). Returns (status, detail)."""
    con.execute("CREATE OR REPLACE TEMP VIEW got_big AS "
                f"SELECT * FROM read_parquet({files!r})")
    gt = {r[0]: r[1] for r in con.execute("DESCRIBE got_big").fetchall()}
    wt = {r[0]: r[1] for r in con.execute(f"DESCRIBE {want_view}").fetchall()}
    if sorted(gt) != sorted(wt):
        return "SCHEMA", f"spark={sorted(gt)} oracle={sorted(wt)}"
    ng = con.execute("SELECT count(*) FROM got_big").fetchone()[0]
    nw = con.execute(f"SELECT count(*) FROM {want_view}").fetchone()[0]
    if ng != nw:
        return "NROWS", f"spark={ng} oracle={nw}"

    def canon(view, types):
        exprs = []
        for c in sorted(types):
            base_g, base_w = gt[c].split("(")[0], wt[c].split("(")[0]
            floaty = {base_g, base_w} - INT_TYPES - {"VARCHAR", "BOOLEAN",
                                                     "DATE", "TIMESTAMP"}
            if base_g in INT_TYPES and base_w in INT_TYPES:
                exprs.append(f'CAST("{c}" AS BIGINT) AS "{c}"')
            elif floaty:
                exprs.append(f'CAST("{c}" AS DOUBLE) AS "{c}"')
            else:
                exprs.append(f'"{c}"')
        return f"SELECT {', '.join(exprs)} FROM {view}"

    g, w = canon("got_big", gt), canon(want_view, wt)
    if ng > FINGERPRINT_ROWS:
        # EXCEPT ALL sorts both multisets (~2x the rows through the
        # temp dir — 126M-row simhash blew a 25 GiB cap); above this
        # size compare grouped hash-sum fingerprints instead: a
        # streaming aggregate, near-zero temp. Per 1024-bucket
        # (row_hash % p) sums + counts; a multiset difference shifts
        # some bucket's sum/count with collision probability ~1/p
        # per differing row pair.
        def fp(q):
            cols = ", ".join(f'"{c}"' for c in sorted(gt))
            return (f"SELECT hash({cols}) % 1024 AS b, count(*) AS n, "
                    f"CAST(sum(hash({cols}) % 1000000007) AS HUGEINT) "
                    f"AS s FROM ({q}) GROUP BY 1")
        bad = con.execute(
            f"SELECT count(*) FROM (({fp(g)} EXCEPT {fp(w)}) "
            f"UNION ALL ({fp(w)} EXCEPT {fp(g)}))").fetchone()[0]
        if bad:
            return "DIFF", f"{bad} fingerprint buckets differ"
        return "OK", (f"{ng} rows x {len(gt)} cols "
                      "(1024-bucket hash-sum fingerprint)")
    bad = con.execute(
        f"SELECT count(*) FROM (({g} EXCEPT ALL {w}) "
        f"UNION ALL ({w} EXCEPT ALL {g}))").fetchone()[0]
    if bad:
        return "DIFF", f"{bad} rows differ (sql multiset compare)"
    return "OK", f"{ng} rows x {len(gt)} cols (sql multiset compare)"


SQLCMP_ROWS = int(os.environ.get("GRAFT_SQLCMP_ROWS", "5000000"))
FINGERPRINT_ROWS = int(os.environ.get("GRAFT_FINGERPRINT_ROWS",
                                      "50000000"))


def main(out_dir, sf_dir):
    con = duckdb.connect()
    # Resource caps for sf10-scale oracle runs: an uncapped DuckDB
    # spill once filled the disk and took a concurrent Spark gate
    # down with it. Threads also matter when Spark shares the box.
    for env, pragma in (("GRAFT_DUCKDB_THREADS", "threads"),
                        ("GRAFT_DUCKDB_MEM", "memory_limit"),
                        ("GRAFT_DUCKDB_TEMP", "max_temp_directory_size")):
        val = os.environ.get(env)
        if val:
            con.execute(f"SET {pragma} = '{val}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(filter(None, os.environ.get("GRAFT_SKIP", "").split(",")))
    ok = fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if name in skip:
            print(f"[SKIP ] {name}: GRAFT_SKIP")
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[MISS ] {name}: no parquet written")
            fail += 1
            continue
        n_got = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        if name in oracle and n_got > SQLCMP_ROWS:
            try:
                big_sql = (materialize_ctes(oracle[name])
                           if force_materialize() else oracle[name])
                con.execute("CREATE OR REPLACE TEMP VIEW want_big AS "
                            f"({big_sql})")
                try:
                    status, detail = sql_multiset_equal(
                        con, files, name, "want_big")
                except Exception as e:
                    if not is_oom(e):
                        raise
                    con.execute("CREATE OR REPLACE TEMP VIEW want_big AS "
                                f"({materialize_ctes(oracle[name])})")
                    status, detail = sql_multiset_equal(
                        con, files, name, "want_big")
            except Exception as e:
                status, detail = "OERR", f"oracle failed: {e}"
            print(f"[{status:<5}] {name}: {detail}")
            if status == "OK":
                ok += 1
            else:
                fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracle:
            print(f"[ROWS ] {name}: {got.num_rows} rows (no oracle declared)")
            continue
        try:
            big = con.execute(
                "SELECT count(*) FROM documents").fetchone()[0] > 1000
            if name == "q_dedup_clusters" and big:
                want = iterative_cc_oracle(con, oracle)
            elif name == "q_cluster_stats" and big:
                want = iterative_cluster_stats_oracle(con, oracle)
            else:
                want = run_oracle(con, oracle[name])
        except Exception as e:
            print(f"[OERR ] {name}: oracle failed: {e}")
            fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"[SCHEMA] {name}: spark={gcols} oracle={wcols}")
            fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"[NROWS] {name}: spark={got.num_rows} oracle={want.num_rows}")
            fail += 1
            continue
        grows = list(zip(*[got.column(c).to_pylist() for c in gcols]))
        wrows = list(zip(*[want.column(c).to_pylist() for c in gcols]))
        bad = None
        for i, (g, w) in enumerate(zip(grows, wrows)):
            if tuple(map(norm, g)) != tuple(map(norm, w)):
                bad = (i, g, w)
                break
        if bad:
            i, g, w = bad
            print(f"[DIFF ] {name}: row {i}\n  cols  ={gcols}\n  spark ={g}\n  oracle={w}")
            fail += 1
        else:
            print(f"[OK   ] {name}: {got.num_rows} rows x {len(gcols)} cols")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, "
          f"{len([k for k in oracle if os.path.isdir(os.path.join(out_dir, k))])} with oracle")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
