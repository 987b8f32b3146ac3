package graft

import graft.ops.CompatOps

/** Spark-level wiring of the batch compat query (the core replay is
  * covered by CompatWindowSpec; this pins the groupByKey + sort +
  * flatten plumbing on real testdata). */
class CompatOpsSpec extends SparkSpec {

  test("compat window query: per-window field rows with consistent per-key metadata") {
    val rows = CompatOps.compatDatadrivenWindow(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // every window emits exactly the first event's 3 fields
    val byWindow = rows.groupBy(r => (r.getString(0), r.getLong(1)))
    assert(byWindow.values.forall(_.length == 3))
    assert(byWindow.values.forall(_.map(_.getString(4)).sorted.toSeq ==
      Seq("player", "type", "value")))
    // independent invariant: the 'player' field is the uid constant per
    // key, so its micro-unit average must equal key × 10^6
    rows.filter(_.getString(4) == "player").foreach { r =>
      assert(r.getLong(5) == r.getString(0).toLong * 1000000L,
        s"player avg_ppm ${r.getLong(5)} != key ${r.getString(0)} x 1e6")
    }
    // 'type' values are non-numeric → parse0 gives 0 for every event
    rows.filter(_.getString(4) == "type").foreach(r => assert(r.getLong(5) == 0L))
  }

  test("toPpm: half-even micro-unit rounding of reference decimal strings") {
    assert(CompatOps.toPpm("12.5") == 12500000L)
    assert(CompatOps.toPpm("0") == 0L)
    // halfway cases land on the even micro-digit
    assert(CompatOps.toPpm("0.0000005") == 0L)
    assert(CompatOps.toPpm("0.0000015") == 2L)
    assert(CompatOps.toPpm("0.0000025") == 2L)
    // a 34-sig-digit DECIMAL128 quotient string (10/3) rounds cleanly
    assert(CompatOps.toPpm("3.333333333333333333333333333333333") == 3333333L)
  }
}
