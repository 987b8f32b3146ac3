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
    // key, so its average must equal the key itself
    rows.filter(_.getString(4) == "player").foreach { r =>
      assert(r.getString(5) == r.getString(0),
        s"player avg ${r.getString(5)} != key ${r.getString(0)}")
    }
    // 'type' values are non-numeric → parse0 gives 0 for every event
    rows.filter(_.getString(4) == "type").foreach(r => assert(r.getString(5) == "0"))
  }
}
