package graft

import graft.ops.RelationalOps

/** Bloom-sketch semi-join invariants, for both the portable
  * double-hashed construction (q_bloom_semi_join, cross-engine
  * oracled) and Spark's native runtime-filter expressions
  * (bloomSemiJoinNative, engine-specific bitmap): no false negatives
  * (candidates ⊇ true matches) and a sane false-positive rate at the
  * configured m=65536 sizing. */
class BloomJoinSpec extends SparkSpec {

  private def checkSupersetWithBoundedFp(cand: Long, truth: Long): Unit = {
    assert(truth > 0, "fixture should produce matches")
    assert(cand >= truth, s"bloom dropped true matches: $cand < $truth")
    // 65536 bits for ~<=2000 keys: FPR well under 10% of the probe side
    val probeRows = Tables(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert(cand - truth <= probeRows / 10,
      s"false positives ${cand - truth} exceed 10% of $probeRows")
  }

  test("portable bloom candidates are a superset of true matches with bounded false positives") {
    val r = RelationalOps.bloomSemiJoin(spark, "/root/testdata/sf0.001").head()
    checkSupersetWithBoundedFp(r.getLong(0), r.getLong(1))
  }

  test("native runtime-filter bloom has the same invariants") {
    val r = RelationalOps.bloomSemiJoinNative(spark, "/root/testdata/sf0.001").head()
    checkSupersetWithBoundedFp(r.getLong(0), r.getLong(1))
  }

  test("the portable bit-probe is a pure pipelined projection: no joins, no hash exchanges") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = RelationalOps.bloomPass(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
    // the 128 KB bitmask is a plan literal; probing it must not add
    // any join or keyed data movement to the fact scan, and the
    // 60-bit hash must be materialized exactly once per row (the
    // conjuncts reference h1/h2, never the sha directly)
    assert(!plan.contains("Join"), s"probe side plans a join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe side shuffles the fact scan by key:\n$plan")
    assert("sha2".r.findAllIn(plan).length <= 1,
      s"hash re-evaluated across conjuncts:\n$plan")
  }
}
