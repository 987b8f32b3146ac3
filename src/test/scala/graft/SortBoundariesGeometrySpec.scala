package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** q_sort_boundaries' count-bounded sample (VERDICT r5 item 2): the
  * boundary draw is capped at buckets·cap rows by a per-bucket rank
  * limit, so the one-row sorted-collect holds O(partitions), not
  * O(rows), at any corpus size. The geometry is a runtime conf
  * (`spark.graft.sortsample.{mod,buckets,cap}`) and the DuckDB oracle
  * regenerates from the same three numbers — this spec proves the
  * knob works at a second geometry, that the cap genuinely binds, and
  * that the rank limit reaches the plan as WindowGroupLimit (the
  * map-side top-heap that keeps the exchange O(tasks·buckets·cap)). */
class SortBoundariesGeometrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def boundariesAt(mod: Int, buckets: Int, cap: Int): Seq[Row] = {
    spark.conf.set("spark.graft.sortsample.mod", mod.toString)
    spark.conf.set("spark.graft.sortsample.buckets", buckets.toString)
    spark.conf.set("spark.graft.sortsample.cap", cap.toString)
    try RelationalOps.sortBoundaries(spark, dir).collect().toSeq
    finally {
      spark.conf.unset("spark.graft.sortsample.mod")
      spark.conf.unset("spark.graft.sortsample.buckets")
      spark.conf.unset("spark.graft.sortsample.cap")
    }
  }

  test("conf plumbing: explicit default geometry equals the default run") {
    val dflt = RelationalOps.sortBoundaries(spark, dir).collect().toSeq
    assert(boundariesAt(RelationalOps.SbMod, RelationalOps.SbBuckets,
      RelationalOps.SbCap) == dflt)
  }

  test("second geometry: cap binds and the plan invariants still hold") {
    // mod=10 keeps ~10% of sf0.001 lineitem (~600 rows) — far more
    // than the 8×4=32-row cap, so this geometry exercises the bound
    val rows = boundariesAt(10, 8, 4)
    assert(rows.map(_.getAs[Long]("range_id")).toSeq == (0L to 7L))
    val maxes = rows.map(_.getAs[Double]("range_max"))
    val mins = rows.map(_.getAs[Double]("range_min"))
    maxes.zip(mins.drop(1)).foreach { case (hi, nextLo) =>
      assert(hi <= nextLo, s"overlapping ranges: $hi > $nextLo")
    }
    val ppm = rows.map(_.getAs[Long]("load_ppm")).sum
    assert(ppm <= 1000000L && ppm > 1000000L - 8)
  }

  test("the sample is count-bounded: ≤ buckets·cap rows survive the rank limit") {
    val ph = "cast(conv(substring(sha2(cast(concat(l_orderkey, ':', " +
      "l_linenumber) as string), 256), 1, 15), 16, 10) as bigint)"
    val h = Tables(spark, dir, "lineitem")
      .select(expr(ph).as("h"))
    val drawn = h.where(expr("h % 10 = 0")).count()
    assert(drawn > 8L * 4L, s"mod=10 draw $drawn too small to bind the cap")
    // the capped sample the query actually sorts:
    val capped = h.where(expr("h % 10 = 0"))
      .withColumn("bucket", expr("(h div 10) % 8"))
      .groupBy("bucket").count()
      .agg(sum(least(col("count"), lit(4L)))).head().getLong(0)
    assert(capped <= 8L * 4L)
  }

  test("the rank limit reaches the plan as WindowGroupLimit") {
    val df = RelationalOps.sortBoundaries(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit not pushed down:\n$plan")
  }

  test("the derived oracle follows the geometry and the declared one is the default") {
    val o = RelationalOps.sortBoundariesOracle(10, 8, 4)
    assert(o.contains("% 10 = 0") && o.contains("(h // 10) % 8") &&
      o.contains("rk <= 4"))
    assert(RelationalOps.oracles("q_sort_boundaries") ==
      RelationalOps.sortBoundariesOracle())
  }
}
