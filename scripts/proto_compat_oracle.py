#!/usr/bin/env python3
"""Prototype: validate the DuckDB WITH RECURSIVE oracle for
q_compat_datadriven_window against a pure-Python replay of the
reference recurrence (DispatcherFunction.cs:66-162).

Usage: python3 scripts/proto_compat_oracle.py <sf_dir>
"""
import sys
from decimal import Decimal, ROUND_HALF_EVEN

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WIN = 1_000_000  # 1 second in us


def python_replay(rows):
    """rows: (key, ts_us, event_id, cents) sorted per key. Returns
    list of (key, win_ts_us, name, avg_ppm)."""
    from collections import defaultdict
    by_key = defaultdict(list)
    for k, ts, eid, cents, uid in rows:
        by_key[k].append((ts, eid, cents, uid))
    out = []
    for k, evs in by_key.items():
        evs.sort()
        start = None
        head = 0  # index into evs of queue head; queue = evs[head:enq_end]
        n = len(evs)
        for b0 in range(0, n, 100):
            batch = evs[b0:b0 + 100]
            if start is None:
                start = batch[0][0]
            push = False
            for ts, _, _, _ in batch:
                if ts - start >= WIN:
                    start = ts
                    push = True
            enq_end = b0 + len(batch)  # queue now evs[head:enq_end]
            if push:
                if head >= enq_end:
                    continue  # empty queue -> Left(0): nothing popped
                drain_start = evs[head][0]
                b = None
                for i in range(head, enq_end):
                    if evs[i][0] - drain_start >= WIN:
                        b = i
                        break
                if b is None:
                    head = enq_end  # underflow: all popped + lost
                else:
                    window = evs[head:b + 1]
                    m = len(window)
                    sc = sum(w[2] for w in window)
                    uid = window[0][3]
                    # avg ppm half-even of (sc/100/m)*1e6 = sc*1e4/m
                    ppm = int((Decimal(sc) * 10000 / Decimal(m))
                              .quantize(Decimal(1), rounding=ROUND_HALF_EVEN))
                    # Python Decimal default context is 28 digits; exact
                    # rational analysis in the scaladoc shows 28 vs 34
                    # digits both round identically at ppm scale.
                    out.append((k, window[0][0], "value", ppm))
                    out.append((k, window[0][0], "player", uid * 1000000))
                    out.append((k, window[0][0], "type", 0))
                    head = b + 1
    out.sort(key=lambda r: (r[0], r[1], r[2]))
    return out


ORACLE = """
WITH RECURSIVE
ev AS (
  SELECT CAST(user_id AS VARCHAR) AS key, user_id AS uid,
         epoch_us(ts) AS ts_us, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_k,
         CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM events
),
st AS (
  SELECT key, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS start_us,
         FALSE AS push, CAST(1 AS BIGINT) AS head,
         CAST(NULL AS BIGINT) AS w_head, CAST(NULL AS BIGINT) AS w_b
  FROM (SELECT DISTINCT key FROM ev)
  UNION ALL
  SELECT key, rn,
         start2,
         CASE WHEN batch_end THEN FALSE ELSE push2 END,
         CASE WHEN batch_end AND push2 AND head <= rn
              THEN COALESCE(b + 1, rn + 1) ELSE head END,
         CASE WHEN batch_end AND push2 AND head <= rn AND b IS NOT NULL
              THEN head END,
         CASE WHEN batch_end AND push2 AND head <= rn THEN b END
  FROM (
    SELECT s.key, e.rn, s.head,
           CASE WHEN e.ts_us - COALESCE(s.start_us, e.ts_us) >= 1000000
                THEN e.ts_us ELSE COALESCE(s.start_us, e.ts_us) END AS start2,
           (s.push OR e.ts_us - COALESCE(s.start_us, e.ts_us) >= 1000000)
             AS push2,
           (e.rn % 100 = 0 OR e.rn = e.n_k) AS batch_end,
           (SELECT MIN(x.rn) FROM ev x, ev h
             WHERE h.key = s.key AND h.rn = s.head
               AND x.key = s.key AND x.rn BETWEEN s.head AND e.rn
               AND x.ts_us - h.ts_us >= 1000000) AS b
    FROM st s JOIN ev e ON e.key = s.key AND e.rn = s.rn + 1
  )
),
win AS (
  SELECT key, w_head AS h, w_b AS b FROM st WHERE w_head IS NOT NULL
),
agg AS (
  SELECT w.key, hd.ts_us AS win_ts_us, hd.uid,
         SUM(x.cents) AS sc, COUNT(*) AS m
  FROM win w
  JOIN ev hd ON hd.key = w.key AND hd.rn = w.h
  JOIN ev x ON x.key = w.key AND x.rn BETWEEN w.h AND w.b
  GROUP BY 1, 2, 3
),
ppm AS (
  SELECT key, win_ts_us, uid, sc * 10000 AS nn, m,
         (sc * 10000) // m AS q, (sc * 10000) % m AS r
  FROM agg
)
SELECT key, win_ts_us, 'dev-' || key AS deviceid, key AS sessionid,
       nm.name,
       CASE nm.name
         WHEN 'value' THEN q + (CASE WHEN 2 * r > m THEN 1
                                     WHEN 2 * r < m THEN 0
                                     ELSE q % 2 END)
         WHEN 'player' THEN uid * 1000000
         ELSE 0 END AS avg_ppm
FROM ppm CROSS JOIN (VALUES ('value'), ('player'), ('type')) AS nm(name)
ORDER BY key, win_ts_us, nm.name
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    rows = con.execute("""
        SELECT CAST(user_id AS VARCHAR), epoch_us(ts), event_id,
               CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2)) * 100 AS BIGINT),
               user_id
        FROM events""").fetchall()
    want = python_replay(rows)
    got = con.execute(ORACLE).fetchall()
    got_cmp = [(r[0], r[1], r[4], r[5]) for r in got]
    print(f"python rows={len(want)} sql rows={len(got_cmp)}")
    if want == got_cmp:
        print("MATCH")
        return 0
    for i, (w, g) in enumerate(zip(want, got_cmp)):
        if w != g:
            print(f"first diff at {i}: python={w} sql={g}")
            break
    return 1


if __name__ == "__main__":
    sys.exit(main())
