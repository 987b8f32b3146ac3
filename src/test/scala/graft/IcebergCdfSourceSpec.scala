package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{DeltaRead, DeltaWrite, IcebergWrite}

/** The `graft-iceberg-cdf` streaming source — [[graft.sources
  * .DeltaCdfSource]]'s Iceberg twin: snapshot-id offsets, per-batch
  * [[graft.sources.IcebergRead.readChanges]] over the newly committed
  * ancestry range (incl. a position-delete visibility commit), the
  * oldest-ancestor replay surfacing the first snapshot's own rows as
  * inserts, and exactly-once propagation into the Delta append sink
  * across stop/restart cycles — a cross-format change pipe
  * (Iceberg → stream → Delta) with zero duplicates or gaps. */
class IcebergCdfSourceSpec extends SparkSpec {

  private def fresh(p: String): String =
    Files.createTempDirectory(p).toString

  private val dstSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("_change_type", StringType),
    StructField("_commit_snapshot_id", LongType)))

  private def changes(dst: String): Seq[(Long, String, Long)] =
    DeltaRead.read(spark, dst)
      .select("_commit_snapshot_id", "_change_type", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted

  private def runOnce(src: String, dst: String, ckpt: String,
                      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-iceberg-cdf")
      .option("path", src)
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream
      .foreachBatch(DeltaWrite.appendSink(dst, appId = "ice-cdf-spec"))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
  }

  test("snapshot ancestry propagates exactly once across restarts, " +
      "including a delete visibility commit") {
    import spark.implicits._
    val src = fresh("graft_icecdf_src_")
    val dst = fresh("graft_icecdf_dst_")
    val ckpt = fresh("graft_icecdf_ckpt_")
    IcebergWrite.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src) // snap 1
    DeltaWrite.create(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dstSchema), dst)

    // run 1: the oldest ancestor's own rows replay as inserts
    runOnce(src, dst, ckpt)
    assert(changes(dst) === Seq((1L, "insert", 1L), (1L, "insert", 2L)))

    // foreign commits while the query is down: an append and a
    // zero-rewrite position delete
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), src) // snap 2
    IcebergWrite.delete(spark, src, col("id") === 1L) // snap 3

    runOnce(src, dst, ckpt)
    assert(changes(dst) === Seq((1L, "insert", 1L), (1L, "insert", 2L),
      (2L, "insert", 3L), (3L, "delete", 1L)))

    // idle restart: no dupes; one more commit: no gap
    runOnce(src, dst, ckpt)
    assert(changes(dst).size === 4)
    IcebergWrite.append(spark, Seq((4L, "d")).toDF("id", "v"), src) // snap 4
    runOnce(src, dst, ckpt)
    assert(changes(dst).last === ((4L, "insert", 4L)))
  }

  test("latest on a SINGLE-snapshot table emits nothing — the start " +
      "mode is pinned, never re-derived (review r15)") {
    import spark.implicits._
    val src = fresh("graft_icecdf1_src_")
    val dst = fresh("graft_icecdf1_dst_")
    val ckpt = fresh("graft_icecdf1_ckpt_")
    // current == oldest ancestor: a mode re-derivation would mistake
    // this `latest` start for a history replay and emit the table
    IcebergWrite.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    DeltaWrite.create(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dstSchema), dst)
    runOnce(src, dst, ckpt, Map("startingSnapshot" -> "latest"))
    assert(changes(dst).isEmpty,
      "a changes-only start must not replay the single snapshot")
    // and the next foreign commit still arrives
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), src)
    runOnce(src, dst, ckpt, Map("startingSnapshot" -> "latest"))
    assert(changes(dst) === Seq((2L, "insert", 3L)))
  }

  test("startingSnapshot=latest skips history and pins its resolution") {
    import spark.implicits._
    val src = fresh("graft_icecdfl_src_")
    val dst = fresh("graft_icecdfl_dst_")
    val ckpt = fresh("graft_icecdfl_ckpt_")
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), src) // snap 1
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), src) // snap 2
    DeltaWrite.create(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dstSchema), dst)

    runOnce(src, dst, ckpt, Map("startingSnapshot" -> "latest"))
    assert(changes(dst).isEmpty)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      ckpt, "sources", "0", "graft-cdf-start")),
      "the latest-pin must live inside the checkpoint, not the cwd")

    // a commit lands while down; the restart must not re-resolve past it
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), src) // snap 3
    runOnce(src, dst, ckpt, Map("startingSnapshot" -> "latest"))
    assert(changes(dst) === Seq((3L, "insert", 3L)))
  }
}
