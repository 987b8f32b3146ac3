#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

GRAFT_SKIP=q_a,q_b skips named queries (e.g. q_dedup_clusters at
sf >= 0.1: its oracle's recursive transitive closure is quadratic in
component size — the Spark side is the scalable formulation).

Reads each <out_dir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the sf_dir
tables, sorts columns by name, and compares values row by row.
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


def main(out_dir, sf_dir):
    con = duckdb.connect()
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
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracle:
            print(f"[ROWS ] {name}: {got.num_rows} rows (no oracle declared)")
            continue
        try:
            want = con.execute(oracle[name]).fetch_arrow_table()
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
