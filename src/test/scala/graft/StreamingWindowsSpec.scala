package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingWindows

/** Idiomatic streaming path: aligned windows + watermark. Asserts the
  * two behaviors that deliberately DIFFER from the compat path — the
  * window closes via the watermark (no next-event trigger needed) and
  * late data beyond the watermark is dropped, not silently merged
  * (the reference merges it, SURVEY §2.B). */
class StreamingWindowsSpec extends SparkSpec {

  private def ev(uid: Long, tsUs: Long, v: Double): (Long, Timestamp, Double) =
    (uid, new Timestamp(tsUs / 1000), v)

  test("aligned 1s windows emit on watermark advance; late data is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "value")
    val query = StreamingWindows.demuxWindowAvg(events, "2 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,1): two events; then advance event time far enough
      // that the watermark (max ts - 2s) passes the window end
      stream.addData(Seq(ev(1, 0L, 10.0), ev(1, 500000L, 20.0)))
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 4000000L, 99.0))) // pushes watermark to 2s
      query.processAllAvailable()
      // a straggler for the long-closed [0,1) window: beyond watermark
      stream.addData(Seq(ev(1, 100000L, 1000.0)))
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 8000000L, 1.0))) // advance again
      query.processAllAvailable()

      val rows = spark.table("win_out")
        .select(col("user_id"), col("win_start").cast("long").as("s"),
          col("avg_value"), col("n_events"))
        .as[(Long, Long, Double, Long)].collect().sortBy(_._2)
      val w0 = rows.find(_._2 == 0L).get
      // closed with avg 15 over TWO events — the late 1000.0 was
      // dropped, not merged (compat would have merged it)
      assert(w0._3 == 15.0 && w0._4 == 2L)
    } finally query.stop()
  }

  test("streaming dedup drops repeats across micro-batches, keeps state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "value")
    val query = StreamingWindows.dedupStream(events, Seq("user_id", "value"), "5 seconds")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Seq(ev(1, 0L, 10.0), ev(1, 100000L, 10.0))) // dup within batch
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 200000L, 10.0), ev(2, 200000L, 7.0))) // dup across batches
      query.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select(col("user_id"), col("value")).as[(Long, Double)].collect().sorted
      assert(rows.toSeq == Seq((1L, 10.0), (2L, 7.0))) // one survivor per key
    } finally query.stop()
  }

  test("session windows merge within gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "value")
    val query = StreamingWindows.sessionize(events, "5 seconds", "1 second")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Seq(ev(1, 0L, 1.0), ev(1, 3000000L, 2.0), // one session
        ev(1, 20000000L, 3.0))) // gap > 5s: new session
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 60000000L, 4.0))) // advance watermark, close both
      query.processAllAvailable()

      val rows = spark.table("sess_out")
        .select(col("user_id"), col("session_start").cast("long").as("s"),
          col("n_events")).as[(Long, Long, Long)].collect().sortBy(_._2)
      assert(rows.take(2).map(r => (r._2, r._3)).toSeq == Seq((0L, 2L), (20L, 1L)))
    } finally query.stop()
  }
}
