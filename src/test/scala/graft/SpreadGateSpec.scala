package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `Tables.spread` self-gating (r16, VERDICT r15 item 8): the
  * single-split repartition must fire on single-split scans (the
  * driver testdata shape) and must NOT fire on multi-split tables —
  * a production deployment that forgets `SPARK_GRAFT_SINGLE_SPLIT`
  * must not pay a full fact-table repartition in front of every
  * sha-bearing aggregate. */
class SpreadGateSpec extends SparkSpec {

  private def hasRoundRobin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression => r
    }.nonEmpty

  // the env override (if set in this JVM) bypasses detection — these
  // tests pin the DETECTION path, so they only run when it is unset
  private val envSet = sys.env.contains("SPARK_GRAFT_SINGLE_SPLIT")

  test("spread fires on a single-file single-row-group table") {
    assume(!envSet)
    val dir = Files.createTempDirectory("spread_one").toString
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(hasRoundRobin(Tables.spread(spark, df)))
  }

  test("spread is a no-op on a single file with MANY row groups") {
    assume(!envSet)
    val dir = Files.createTempDirectory("spread_rg").toString
    // tiny row-group target forces multiple groups into one file —
    // the scan can parallelize, so the repartition must not fire
    spark.range(0, 200000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(!hasRoundRobin(Tables.spread(spark, df)))
  }

  test("spread is a no-op on a multi-split table") {
    assume(!envSet)
    val dir = Files.createTempDirectory("spread_many").toString
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(4).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.rdd.getNumPartitions > 1)
    val out = Tables.spread(spark, df)
    assert(!hasRoundRobin(out))
    // and the frame is the same object semantics-wise: same plan
    assert(out.queryExecution.logical eq df.queryExecution.logical)
  }
}
