package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.ops.LlmOps

/** The q_stratified_sample scale mitigation (VERDICT r03 item 4): an
  * adaptive hash-threshold pre-filter caps the per-stratum window sort
  * input at ~StratPrefilterC expected rows regardless of corpus size.
  * Two things must hold and stay held:
  *  1. the filter PRESERVES the answer — top-5-by-hash per stratum is
  *     identical with and without the filter (the smallest hashes are
  *     by construction below any threshold that admits >= 5 rows);
  *  2. the filter actually sits BELOW the window sort in the physical
  *     plan (a filter applied after ranking would be a correctness
  *     no-op but a scale lie). */
class StratifiedPrefilterSpec extends SparkSpec {

  /** The r3 formulation: rank every doc, no pre-filter. */
  private def unfiltered(dir: String) = {
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        expr("cast(conv(substring(sha2(concat('strat:', cast(doc_id as string)), 256), 1, 15), 16, 10) as bigint)")
          .as("hk"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("doc_id"), col("source"))
      .orderBy("lang", "rn")
  }

  test("pre-filtered sample is identical to the unfiltered sample") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = LlmOps.stratifiedSample(spark, dir).collect().toSeq
      val want = unfiltered(dir).collect().toSeq
      assert(got.nonEmpty, s"$dir: empty sample")
      assert(got == want, s"$dir: pre-filter changed the sample")
    }
  }

  test("the hash-threshold filter sits below the window sort") {
    // AQE query stages are tree leaves, so node-level collect() can't
    // descend past shuffle boundaries — assert on treeString order
    // instead: children print below parents, so "filter below the
    // window" means the hk-threshold Filter line appears AFTER the
    // ranking Window line.
    val df = LlmOps.stratifiedSample(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).treeString
    val lines = plan.linesIterator.toVector
    val windowAt = lines.indexWhere(_.contains("Window ["))
    assert(windowAt >= 0, s"no Window in plan:\n$plan")
    // Catalyst folds the threshold predicate into the join condition
    // (BroadcastHashJoin ... (hk# < least(...))) rather than keeping a
    // standalone Filter — either form counts, as long as it evaluates
    // below the ranking window's sort.
    val thresholdAt = lines.indexWhere(l =>
      l.contains("hk#") && l.contains("least("))
    assert(thresholdAt >= 0, s"no hk-threshold predicate in plan:\n$plan")
    assert(thresholdAt > windowAt,
      s"hk threshold is not below the ranking window:\n$plan")
  }

  test("expected survivors per stratum stay >= 5 with wide margin") {
    // the analytic safety condition behind the filter: C = 64 expected
    // survivors, need 5 — holds per stratum on real testdata
    val base = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("lang"),
        expr("cast(conv(substring(sha2(concat('strat:', cast(doc_id as string)), 256), 1, 15), 16, 10) as bigint)")
          .as("hk"))
    val n = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val survivors = base.join(n, "lang")
      .where(col("hk") < least(lit(math.pow(2d, 60)).cast("long"),
        ceil(lit(LlmOps.StratPrefilterC.toDouble * math.pow(2d, 60)) / col("n"))
          .cast("long")))
      .groupBy(col("lang")).agg(count(lit(1)).as("kept"))
      .collect()
    assert(survivors.nonEmpty)
    survivors.foreach { r =>
      val kept = r.getAs[Long]("kept")
      assert(kept >= 5, s"${r.getAs[String]("lang")}: only $kept survivors")
    }
  }
}
