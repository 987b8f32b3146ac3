package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.EventOps
import graft.streaming.StreamingCusum

/** The streaming CUSUM monitor must agree with the oracled batch
  * scan: replaying the event-time-ordered log through MemoryStream
  * micro-batches against batch-computed baselines, each key's FINAL
  * excursion row must equal q_cusum_changepoint's max_up_u/max_dn_u —
  * stream ≡ batch ≡ DuckDB — at any micro-batch chunking.
  */
class StreamingCusumSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def baselines: Map[Long, (Long, BigInt)] =
    Tables.events(spark, sf)
      .select(col("user_id"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("yu"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("yu").cast("decimal(38,0)")).as("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger))).toMap

  private def replay(chunks: Int): Map[Long, (Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .orderBy("ts_us", "event_id") // arrival order = event-time order
      .as[(Long, Long, Long, Double)]
      .collect().toSeq
    val stream = MemoryStream[(Long, Long, Long, Double)]
    val name = s"cusum_sink_$chunks"
    val query = StreamingCusum.monitor(spark,
        stream.toDS().toDF("user_id", "ts_us", "event_id", "value"),
        baselines)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val w = Window.partitionBy(col("user_id")).orderBy(col("n_seen").desc)
      spark.table(name)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("user_id", "n_seen", "max_up_u", "max_dn_u")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    } finally query.stop()
  }

  test("streamed CUSUM equals the oracled batch scan at any chunking") {
    val batch = EventOps.cusumChangepoint(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for (chunks <- Seq(1, 7)) {
      val streamed = replay(chunks)
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, (nSeen, up, dn)) =>
        val (n, bUp, bDn) = batch(u)
        assert(nSeen == n, s"user $u: saw $nSeen of $n events")
        assert(up == bUp, s"user $u: stream max_up $up != batch $bUp")
        assert(dn == bDn, s"user $u: stream max_dn $dn != batch $bDn")
      }
    }
  }

  test("excursion maxima are monotone across the stream's updates") {
    // Update-mode rows for a key must never decrease — the state is
    // a running max; a decrease means state was lost or re-zeroed.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val stream = MemoryStream[(Long, Long, Long, Double)]
    val query = StreamingCusum.monitor(spark,
        stream.toDS().toDF("user_id", "ts_us", "event_id", "value"),
        baselines)
      .writeStream.format("memory").queryName("cusum_mono")
      .outputMode(OutputMode.Update).start()
    try {
      rows.grouped(200).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      val perKey = spark.table("cusum_mono")
        .orderBy("user_id", "n_seen").collect()
        .groupBy(_.getLong(0))
      perKey.foreach { case (u, updates) =>
        val ups = updates.map(_.getLong(2)).toSeq
        assert(ups == ups.sorted, s"user $u: max_up not monotone: $ups")
      }
    } finally query.stop()
  }
}
