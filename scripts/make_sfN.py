#!/usr/bin/env python3
"""Synthesize an sfN-scale probe dataset from /root/testdata/sf0.1.

Usage: python3 scripts/make_sfN.py <copies> <out_dir>
e.g.:  python3 scripts/make_sfN.py 10 target/testdata/sf1

VERDICT r7 #5 asks for a gate run above sf0.1, but the driver only
ships sf{0.001,0.01,0.1}. This script builds the probe input INSIDE
the repo (never touching /root/testdata) by unioning <copies> shifted
replicas of every scaling table: each copy adds copy_index * OFF to
the table's key columns, with OFF = max(key)+1 shared across the
tables that reference that key (custkey, partkey, suppkey, orderkey)
so foreign keys stay consistent. Dimension tables (region, nation)
are bounded by schema and copied as-is. Row payloads are NOT
perturbed — identical replicas under fresh keys deliberately stress
tie-breaking determinism and dedup-family candidate volume at 10x.

Timestamps: DuckDB re-writes events.ts as parquet TIMESTAMP(MICROS)
NTZ — one of the two physical types the adaptive loader
(Tables.scala) supports and the same one the r6 driver regression
shipped, so the probe also re-exercises that path.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(copies, out_dir, only=None):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(os.cpu_count() or 8, 16)}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def off(table, col):
        return con.execute(
            f"SELECT max({col}) + 1 FROM {src(table)}").fetchone()[0]

    custoff = off("customer", "c_custkey")
    suppoff = off("supplier", "s_suppkey")
    partoff = off("part", "p_partkey")
    ordoff = off("orders", "o_orderkey")
    evoff = off("events", "event_id")
    useroff = off("events", "user_id")
    docoff = off("documents", "doc_id")
    vecoff = off("embeddings", "vec_id")

    shifted = {
        "region": None,
        "nation": None,
        "customer": f"c_custkey + c * {custoff} AS c_custkey, c_name, "
                    "c_nationkey, c_acctbal, c_mktsegment",
        "supplier": f"s_suppkey + c * {suppoff} AS s_suppkey, s_name, "
                    "s_nationkey, s_acctbal",
        "part": f"p_partkey + c * {partoff} AS p_partkey, p_name, p_brand, "
                "p_type, p_size, p_retailprice",
        "orders": f"o_orderkey + c * {ordoff} AS o_orderkey, "
                  f"o_custkey + c * {custoff} AS o_custkey, o_orderstatus, "
                  "o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": f"l_orderkey + c * {ordoff} AS l_orderkey, "
                    f"l_partkey + c * {partoff} AS l_partkey, "
                    f"l_suppkey + c * {suppoff} AS l_suppkey, l_linenumber, "
                    "l_quantity, l_extendedprice, l_discount, l_tax, "
                    "l_returnflag, l_linestatus, l_shipdate",
        "events": f"event_id + c * {evoff} AS event_id, ts, "
                  f"user_id + c * {useroff} AS user_id, event_type, "
                  "value, props",
        "documents": f"doc_id + c * {docoff} AS doc_id, text, lang, "
                     "source, n_chars",
        "embeddings": f"vec_id + c * {vecoff} AS vec_id, embedding, label",
    }

    for t, proj in shifted.items():
        if only and t not in only:
            continue
        dst = f"{out_dir}/{t}.parquet"
        if proj is None:
            q = f"SELECT * FROM {src(t)}"
        else:
            q = (f"SELECT {proj} FROM {src(t)} "
                 f"CROSS JOIN (SELECT unnest(range({copies})) AS c) "
                 f"ORDER BY 1")
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')")\
            .fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    # optional 3rd arg: comma-separated table subset, e.g.
    #   python3 scripts/make_sfN.py 100 target/testdata/sf10 documents,embeddings
    # (the r9 sf10 probe needs only the dedup-family inputs)
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    main(int(sys.argv[1]), sys.argv[2], subset)
