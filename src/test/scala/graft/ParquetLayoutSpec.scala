package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.sources.ParquetLayout

/** The two layout guarantees, asserted on the physical plan: a filter
  * on a hive-partition column prunes partitions at planning time, and
  * a join between co-bucketed tables plans with no shuffle exchange. */
class ParquetLayoutSpec extends SparkSpec {

  /** Final physical plan text, unwrapping AQE (shuffles hide inside
    * AdaptiveSparkPlanExec, whose `children` is empty — a plain
    * `collect` on the outer plan sees nothing). */
  private def finalPlanString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes stage decisions
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
  }

  private def shuffleCount(df: DataFrame): Int =
    "Exchange hashpartitioning".r.findAllIn(finalPlanString(df)).length

  test("partitioned write prunes non-matching partitions from the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "fr", "d"))
      .toDF("doc_id", "lang", "text")
    ParquetLayout.writePartitioned(docs, dir, Seq("lang"), Seq("doc_id"))

    val back = ParquetLayout.readPartitioned(spark, dir)
      .where(col("lang") === "en")
    assert(back.count() == 2)
    // planning-time pruning: the scan's selected partition directories
    // are only lang=en — de/fr bytes are never opened
    val scan = back.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString).toSeq
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan should select only lang=en files, got ${files.toSeq}")
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1L to 100L).map(i => (i, i % 10)).toDF("k", "grp")
      val dims = (1L to 50L).map(i => (i, s"name_$i")).toDF("k", "nm")
      ParquetLayout.writeBucketed(facts, "t_facts_b", "k", 4)
      ParquetLayout.writeBucketed(dims, "t_dims_b", "k", 4)

      val joined = spark.table("t_facts_b").join(spark.table("t_dims_b"), "k")
      assert(joined.count() == 50)
      assert(shuffleCount(joined) == 0,
        s"co-bucketed join must not shuffle:\n${finalPlanString(joined)}")

      // control: the same join over unbucketed parquet DOES shuffle —
      // proves the zero-shuffle assertion above is meaningful
      facts.write.mode("overwrite").format("parquet").saveAsTable("t_facts_p")
      dims.write.mode("overwrite").format("parquet").saveAsTable("t_dims_p")
      val plain = spark.table("t_facts_p").join(spark.table("t_dims_p"), "k")
      assert(shuffleCount(plain) > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("t_facts_b", "t_dims_b", "t_facts_p", "t_dims_p")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("streaming windows land as partitioned parquet via foreachBatch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft_stream_land").toString + "/out"
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val windows = graft.streaming.StreamingWindows.demuxWindowAvg(
      stream.toDF().toDF("user_id", "ts", "value"), "2 seconds")
    val query = graft.sources.ParquetLayout
      .streamToPartitioned(windows, dir, Seq("user_id")).start()
    try {
      def ev(uid: Long, tsUs: Long, v: Double) =
        (uid, new Timestamp(1700000000000L + tsUs / 1000), v)
      stream.addData(Seq(ev(1, 0L, 10.0), ev(1, 500000L, 20.0), ev(2, 0L, 5.0)))
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 8000000L, 1.0), ev(2, 8000000L, 1.0))) // close windows
      query.processAllAvailable()

      val landed = graft.sources.ParquetLayout.readPartitioned(spark, dir)
      assert(landed.count() >= 2) // both users' first windows closed + landed
      // layout guarantee carries over: a user_id filter prunes directories
      val pruned = landed.where(col("user_id") === 1)
      val scan = pruned.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.selectedPartitions.toPartitionArray
        .forall(_.filePath.toString.contains("user_id=1")))
      val w1 = pruned.orderBy("win_start").select(col("avg_value"))
        .as[Double].head()
      assert(w1 == 15.0)
    } finally query.stop()
  }

  test("bucketed groupBy on the bucket key aggregates without a shuffle") {
    import spark.implicits._
    val facts = (1L to 100L).map(i => (i % 20, i.toDouble)).toDF("k", "v")
    ParquetLayout.writeBucketed(facts, "t_agg_b", "k", 4)
    try {
      val agg = spark.table("t_agg_b").groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 20)
      assert(shuffleCount(agg) == 0,
        s"groupBy on the bucket column must reuse the bucket partitioning:\n${finalPlanString(agg)}")
    } finally spark.sql("DROP TABLE IF EXISTS t_agg_b")
  }
}
