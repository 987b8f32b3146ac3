package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.RunStats

/** Bounded-state streaming anomaly detection: scoring against PRIOR
  * stats only, state carried across micro-batches, and the pure
  * scoring core's batch-split invariance. */
class StreamingAnomalySpec extends SparkSpec {

  private val base = 1700000000000L // ms; far from epoch (join/timeout solver)
  private def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  test("outlier is flagged against prior stats, warmup is not scored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "value")
    val query = StreamingAnomaly.detect(spark, events, minN = 5L, threshold = 3.0)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: warmup of alternating 9/11 (mean 10, sd 1) — no flags
      stream.addData((0 until 6).map(i =>
        (1L, ts(i), if (i % 2 == 0) 9.0 else 11.0)))
      query.processAllAvailable()
      assert(spark.table("anom_out").count() == 0)

      // batch 2: a wild outlier for the SAME key — state carried across
      // micro-batches must flag it; a second user still in warmup must not
      stream.addData(Seq((1L, ts(10), 100.0), (2L, ts(10), 100.0)))
      query.processAllAvailable()
      val rows = spark.table("anom_out")
        .select(col("userId"), col("value"), col("z"))
        .as[(Long, Double, Double)].collect()
      assert(rows.length == 1)
      assert(rows.head._1 == 1L && rows.head._2 == 100.0 && rows.head._3 > 3.0)
    } finally query.stop()
  }

  test("scoring core is micro-batch-split invariant") {
    val events = (0 until 20).map(i =>
      (7L, base + i * 1000L, if (i == 15) 500.0 else 10.0 + (i % 3)))
    val zero = RunStats(0L, 0.0, 0.0, 0L)
    val (sWhole, aWhole) = StreamingAnomaly.scoreSlice(zero, events, 5L, 3.0)
    val (s1, a1) = StreamingAnomaly.scoreSlice(zero, events.take(11), 5L, 3.0)
    val (s2, a2) = StreamingAnomaly.scoreSlice(s1, events.drop(11), 5L, 3.0)
    assert(sWhole == s2)
    assert(aWhole == a1 ++ a2)
    assert(aWhole.map(_.value) == Vector(500.0)) // exactly the planted outlier
  }
}
