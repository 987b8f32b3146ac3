package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDecimation

/** Live min/max decimation: watermark-closed windows emit exactly the
  * two extreme events with the batch twin's tie-breaks (value asc /
  * desc, event_id asc), at one aggregate row of state per open
  * (key, window). */
class StreamingDecimationSpec extends SparkSpec {

  private val base = 1700000000000L // ms, minute-aligned
  private def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  test("a closed window emits its min and max events, ties on event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "event_id", "value")
    val query = StreamingDecimation.decimate(events)
      .writeStream.format("memory").queryName("decim_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window [base, base+60s): extremes 1.0 (ids 3 and 5 tie -> 3)
      // and 9.0 (id 2); mid value ignored
      stream.addData(Seq(
        (1L, ts(1), 1L, 4.0), (1L, ts(2), 2L, 9.0),
        (1L, ts(3), 3L, 1.0), (1L, ts(4), 4L, 7.0), (1L, ts(5), 5L, 1.0)))
      query.processAllAvailable()
      // watermark only advances past the window once a much later
      // event arrives
      stream.addData(Seq((1L, ts(200), 6L, 5.0)))
      query.processAllAvailable()
      val rows = spark.table("decim_out")
        .select("user_id", "min_event_id", "min_value",
          "max_event_id", "max_value", "n_events")
        .as[(Long, Long, Double, Long, Double, Long)].collect().toSeq
      assert(rows == Seq((1L, 3L, 1.0, 2L, 9.0, 5L)))
    } finally query.stop()
  }

  test("max tie-break prefers the smaller event_id like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = stream.toDF().toDF("user_id", "ts", "event_id", "value")
    val query = StreamingDecimation.decimate(events)
      .writeStream.format("memory").queryName("decim_tie_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Seq(
        (2L, ts(1), 11L, 5.0), (2L, ts(2), 12L, 5.0)))
      query.processAllAvailable()
      stream.addData(Seq((2L, ts(200), 13L, 0.0)))
      query.processAllAvailable()
      val r = spark.table("decim_tie_out")
        .select("min_event_id", "max_event_id")
        .as[(Long, Long)].collect().toSeq
      assert(r == Seq((11L, 11L))) // both extremes tie -> smallest id
    } finally query.stop()
  }
}
