package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingSloBurn

/** The streaming SLO monitor must (a) emit a window exactly once,
  * when the watermark closes it, with the same integer-ppm arithmetic
  * as the batch op, and (b) agree with the batch computation on a
  * replay of the same rows — alert and postmortem can't disagree. */
class StreamingSloBurnSpec extends SparkSpec {

  private def ev(tsUs: Long, t: String): (Timestamp, String) =
    (new Timestamp(tsUs / 1000), t)

  test("windows close via watermark with exact ppm rates and breach flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val events = stream.toDF().toDF("ts", "event_type")
    val query = StreamingSloBurn.sloBurn(events, "1 second", "2 seconds")
      .writeStream.format("memory").queryName("slo_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,1)s: 3 events, 1 error -> 333333 ppm, breach
      stream.addData(Seq(ev(0L, "view"), ev(200000L, "error"),
        ev(400000L, "click")))
      // window [1,2)s: 2 events, 0 errors -> 0 ppm, no breach
      stream.addData(Seq(ev(1000000L, "view"), ev(1500000L, "view")))
      query.processAllAvailable()
      // nothing final yet: watermark is still behind both window ends
      assert(spark.table("slo_out").isEmpty)
      // advance the watermark past both windows
      stream.addData(Seq(ev(8000000L, "view")))
      query.processAllAvailable()
      val rows = spark.table("slo_out")
        .select(col("win_start").cast("long").as("s"), col("n_events"),
          col("n_errors"), col("error_ppm"), col("breach"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq((0L, 3L, 1L, 333333L, 1L),
        (1L, 2L, 0L, 0L, 0L)))
    } finally query.stop()
  }

  test("streaming replay agrees with the batch rate arithmetic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deterministic synthetic stream: 40 events over 4 seconds, every
    // 7th an error
    val data = (0 until 40).map { i =>
      ev(i * 100000L, if (i % 7 == 0) "error" else "view")
    }
    val stream = MemoryStream[(Timestamp, String)]
    val events = stream.toDF().toDF("ts", "event_type")
    val query = StreamingSloBurn.sloBurn(events, "1 second", "1 second",
        breachPpm = 100000L)
      .writeStream.format("memory").queryName("slo_replay")
      .outputMode(OutputMode.Append).start()
    try {
      data.grouped(13).foreach { batch =>
        stream.addData(batch); query.processAllAvailable()
      }
      stream.addData(Seq(ev(60000000L, "view"))) // close everything
      query.processAllAvailable()
      val streamed = spark.table("slo_replay")
        .select(col("win_start").cast("long"), col("n_events"),
          col("n_errors"), col("error_ppm"), col("breach"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = data.toDF("ts", "event_type")
        .groupBy(expr("unix_micros(ts) div 1000000").as("s"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("e"))
        .select(col("s"), col("n"), col("e"),
          expr("""cast(cast(e as decimal(38,0)) * 1000000
            div n as bigint)""").as("ppm"))
        .withColumn("breach", when(col("ppm") > 100000L, 1L).otherwise(0L))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
    } finally query.stop()
  }
}
