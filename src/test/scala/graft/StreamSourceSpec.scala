package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.sources.{JsonEvents, StreamSource}
import graft.streaming.StreamingCompat

/** StreamSource closes R1: a user points `format`/`options` at a real
  * broker (kafka / Event Hubs' kafka endpoint); here the built-in
  * `rate` source stands in — no connector jar needed — and drives the
  * SAME post-parse projections end to end: raw JSON surface →
  * JsonEvents.parse (zero dead letters on well-formed blobs) and
  * raw → compatPoints → the flatMapGroupsWithState compat window. */
class StreamSourceSpec extends SparkSpec {

  test("rate source → raw JSON surface parses clean through JsonEvents") {
    val raw = StreamSource.raw(spark, "rate",
      Map("rowsPerSecond" -> "200", "numPartitions" -> "2"))
    assert(raw.isStreaming)
    assert(raw.schema.fieldNames.toSeq == Seq("value", "seq"))

    val query = raw.writeStream.format("memory").queryName("raw_capture")
      .outputMode(OutputMode.Append).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("raw_capture").isEmpty &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        query.processAllAvailable()
      }
      val captured = spark.table("raw_capture")
      assert(!captured.isEmpty, "rate source produced no rows in 30s")
      // batch-parse the capture: every synthesized blob must land in
      // the clean side with a session:player key
      val (ok, dead) = JsonEvents.parse(captured.select("value"))
      assert(dead.isEmpty, "synthesized envelopes hit the dead letter")
      val keys = ok.select("key").distinct().collect().map(_.getString(0))
      assert(keys.nonEmpty && keys.forall(_.matches("sess-\\d+:\\d+")))
    } finally query.stop()
  }

  test("rate source → events projection → idiomatic streaming windows") {
    val events = StreamSource.events(spark,
      StreamSource.raw(spark, "rate",
        Map("rowsPerSecond" -> "200", "numPartitions" -> "2")))
    assert(events.isStreaming)
    assert(events.schema.fieldNames.toSeq == Seq("user_id", "ts", "value"))
    // update mode surfaces per-window running aggregates without
    // waiting out the watermark
    val query = graft.streaming.StreamingWindows.demuxWindowAvg(events)
      .writeStream.format("memory").queryName("rate_win_out")
      .outputMode(OutputMode.Update).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("rate_win_out").isEmpty &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        query.processAllAvailable()
      }
      val rows = spark.table("rate_win_out").collect()
      assert(rows.nonEmpty, "no window aggregate emitted in 30s")
      // player ids 0..7 from the synthesized envelope; counts positive
      assert(rows.forall(r => (0L to 7L).contains(r.getLong(0))))
      assert(rows.forall(_.getLong(3) > 0))
    } finally query.stop()
  }

  test("rate source → compatPoints → streaming compat windows emit rows") {
    import spark.implicits._
    val points = StreamSource.compatPoints(spark,
      StreamSource.raw(spark, "rate",
        Map("rowsPerSecond" -> "200", "numPartitions" -> "2")))
    val query = StreamingCompat.windows(spark, points)
      .writeStream.format("memory").queryName("rate_compat_out")
      .outputMode(OutputMode.Append).start()
    try {
      // windows close once a key sees a point > 1s past its window
      // start; at 200 rows/s over 8 keys that happens within seconds
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("rate_compat_out").isEmpty &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        query.processAllAvailable()
      }
      val rows = spark.table("rate_compat_out")
        .as[graft.streaming.DataDrivenWindow.CompatRow].collect()
      assert(rows.nonEmpty, "no compat window closed in 60s")
      // every emitted window belongs to a synthesized session key and
      // averaged the measurement channel
      assert(rows.forall(r => r.key.matches("sess-\\d+:\\d+")))
      assert(rows.forall(r => r.names == Seq("speed", "player")))
      assert(rows.forall(r => r.avgValues.nonEmpty))
    } finally query.stop()
  }
}
