package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.RelationalOps
import graft.streaming.StreamingFingerprint

/** The streaming audit fold must equal the batch one: feeding the
  * driver's events through MemoryStream micro-batches and reading the
  * final Complete-mode row must reproduce the oracled
  * q_table_fingerprint events row exactly, for ANY micro-batch
  * chunking — the associativity claim the operator's scaladoc makes,
  * asserted on real data.
  */
class StreamingFingerprintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def replayFingerprint(chunks: Int): Row = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"), col("value"))
      .as[(Long, Long, String, Long, Double)]
      .collect().toSeq
    val stream = MemoryStream[(Long, Long, String, Long, Double)]
    val name = s"fp_sink_$chunks"
    val query = StreamingFingerprint.fingerprint(
        stream.toDS().toDF("event_id", "user_id", "event_type", "ts_us", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      spark.table(name).collect()(0)
    } finally query.stop()
  }

  test("streamed fingerprint equals the oracled batch events row at any chunking") {
    val batch = RelationalOps.tableFingerprint(spark, sf)
      .where(col("table_name") === "events")
      .select("n_rows", "xor_hash", "sum_hash_mod").collect()(0)
    for (chunks <- Seq(1, 7)) {
      val streamed = replayFingerprint(chunks)
      assert(streamed.getLong(0) == batch.getLong(0),
        s"n_rows drifted at $chunks chunks")
      assert(streamed.getLong(1) == batch.getLong(1),
        s"xor_hash drifted at $chunks chunks")
      assert(streamed.getLong(2) == batch.getLong(2),
        s"sum_hash_mod drifted at $chunks chunks")
    }
  }
}
