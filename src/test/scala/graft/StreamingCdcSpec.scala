package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.RelationalOps
import graft.streaming.StreamingCdc

/** The streaming compaction must agree with the oracled batch
  * snapshot: replaying the driver's derived change log through
  * MemoryStream micro-batches, each key's FINAL state row (highest
  * n_changes in the Update-mode sink) minus tombstones must equal
  * q_cdc_apply — stream ≡ batch ≡ DuckDB. Also pins the tombstone
  * contract (deleted keys present in the stream, absent from the
  * batch snapshot) and micro-batch-split invariance.
  */
class StreamingCdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def replay(chunks: Int): Map[Long, (String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("value"))
      .orderBy("ts_us", "event_id") // arrival order = event-time order
      .as[(Long, Long, Long, String, Double)]
      .collect().toSeq
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val name = s"cdc_sink_$chunks"
    val query = StreamingCdc.compact(spark,
        stream.toDS().toDF("user_id", "event_id", "ts_us", "event_type", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // final state per key = the Update row with the highest change
      // count (n_changes grows monotonically per key)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n_changes").desc)
      spark.table(name)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("user_id", "last_op", "last_ts_us", "last_value_u", "n_changes")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    } finally query.stop()
  }

  test("streamed compaction equals the oracled q_cdc_apply snapshot at any chunking") {
    val batch = RelationalOps.cdcApply(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val allKeys = Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    for (chunks <- Seq(1, 5)) {
      val streamed = replay(chunks)
      // every key has a final state; tombstones are exactly the
      // keys the batch snapshot dropped
      assert(streamed.keySet == allKeys)
      val live = streamed.filter { case (_, st) => st._1 != "D" }
      assert(live == batch,
        s"live stream state != batch snapshot at $chunks chunks")
      val tombstones = streamed.keySet -- live.keySet
      assert(tombstones == allKeys -- batch.keySet)
    }
  }
}
