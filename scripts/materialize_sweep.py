#!/usr/bin/env python3
"""Guard for check.py's OOM-retry path: every oracle's MATERIALIZED
form must still parse and run. The retry rewrite (AS ( -> AS
MATERIALIZED () only ever executes when an oracle OOMs at gate scale,
so a rewrite bug stays invisible until the worst possible moment —
r12's ADVICE found it corrupting DuckDB named-window clauses (27
oracles carry WINDOW), which would have turned every big-output retry
into a syntax error. This sweep runs all rewritten oracles at a tiny
SF so the path is exercised every time someone cares to check.

Usage: python3 scripts/materialize_sweep.py <oracle_sql.json> <sf_dir>
Exit 0 = all materialized forms ran; 1 = failures printed.
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, materialize_ctes  # noqa: E402


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    bad = []
    nwin = 0
    for name, sql in sorted(oracle.items()):
        if "WINDOW " in sql.upper():
            nwin += 1
        try:
            con.execute(materialize_ctes(sql)).fetchall()
        except Exception as e:
            bad.append((name, str(e).split("\n")[0][:120]))
    print(f"{len(oracle)} oracles, {nwin} with WINDOW clauses")
    if bad:
        print("FAILED under materialization:")
        for n, e in bad:
            print(" ", n, e)
        sys.exit(1)
    print("ALL materialized forms parse and run")


if __name__ == "__main__":
    main()
