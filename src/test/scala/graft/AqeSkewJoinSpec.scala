package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling, plan-asserted (complements q_salted_agg,
  * which shows the MANUAL salt on the aggregation side): a join with
  * one hot key must re-plan at runtime with the skewed partition split
  * across tasks — the zero-code-change answer to join skew at 100 TB.
  * Thresholds are lowered so the handling triggers at test scale; on a
  * real cluster the defaults (256 MB / 5x median) do the same thing. */
class AqeSkewJoinSpec extends SparkSpec {

  private def finalPlanString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes stage decisions
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
  }

  test("hot-key join re-plans with an AQE skew split") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so test-scale bytes count as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      // enough partitions that the hot one towers over the median
      // (the shared test session runs with 2, where median == max)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0: 50k wide rows; keys 1..100: 20 rows each
      val pad = "x" * 100
      val facts = spark.range(50000).select(lit(0L).as("k"), lit(pad).as("pad"))
        .union(spark.range(2000).select((col("id") % 100 + 1).as("k"),
          lit(pad).as("pad")))
      val dims = spark.range(0, 101).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("nm"))
      val joined = facts.join(dims, "k")
      assert(joined.count() == 52000)
      val plan = finalPlanString(joined)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no AQE skew split in the final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
