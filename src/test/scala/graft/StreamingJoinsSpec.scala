package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingJoins

/** Stream-stream join semantics: interval-bounded attribution, state
  * eviction via watermark + range condition, and the left-outer
  * null-pad that only fires once a missing match is provably missing. */
class StreamingJoinsSpec extends SparkSpec {

  // base far from the epoch: the stream-stream join's watermark
  // constraint solver misclassifies rows with near-epoch event times
  // as late even before any watermark advance
  private def ts(us: Long) = new Timestamp(1700000000000L + us / 1000)

  test("interval inner join attributes clicks within the window, ignores outside") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingJoins.attributeClicks(
      imps.toDF().toDF("imp_id", "user_id", "imp_ts"),
      clks.toDF().toDF("click_id", "user_id", "click_ts"),
      attributionWindow = "10 seconds", watermarkDelay = "5 seconds")
    val query = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Seq((100L, 1L, ts(0L)), (101L, 2L, ts(0L))))
      clks.addData(Seq(
        (900L, 1L, ts(3000000L)),   // user 1, +3s: inside window
        (901L, 2L, ts(40000000L)),  // user 2, +40s: outside window
        (902L, 3L, ts(1000000L)))) // no impression for user 3
      query.processAllAvailable()
      val rows = spark.table("attr_out")
        .select(col("imp_id"), col("click_id")).as[(Long, Long)].collect().sorted
      assert(rows.toSeq == Seq((100L, 900L)))
    } finally query.stop()
  }

  test("left outer join null-pads an unmatched impression only after the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingJoins.attributeClicksLeftOuter(
      imps.toDF().toDF("imp_id", "user_id", "imp_ts"),
      clks.toDF().toDF("click_id", "user_id", "click_ts"),
      attributionWindow = "10 seconds", watermarkDelay = "5 seconds")
    val query = joined.writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Seq((100L, 1L, ts(0L)), (101L, 2L, ts(0L))))
      clks.addData(Seq((900L, 1L, ts(2000000L)))) // user 1 clicks; user 2 never does
      query.processAllAvailable()
      // before the watermark passes imp_ts+10s+5s, user 2 must NOT be emitted:
      // "no click yet" is not "no click"
      val early = spark.table("attr_outer_out").select(col("imp_id"))
        .as[Long].collect().sorted
      assert(early.toSeq == Seq(100L))

      // push BOTH watermarks (global watermark = min over sides) past
      // imp_ts + window, forcing the outer emission for imp 101
      imps.addData(Seq((199L, 9L, ts(60000000L))))
      clks.addData(Seq((999L, 9L, ts(60000000L))))
      query.processAllAvailable()
      imps.addData(Seq((198L, 8L, ts(90000000L))))
      clks.addData(Seq((998L, 8L, ts(90000000L))))
      query.processAllAvailable()

      val all = spark.table("attr_outer_out")
        .select(col("imp_id"), col("click_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted
      assert(all.contains((101L, -1L)), s"expected null-padded imp 101, got ${all.toSeq}")
      assert(all.contains((100L, 900L)))
    } finally query.stop()
  }

  test("stream-static enrichment broadcasts the dimension, no state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = MemoryStream[(Long, Long, Timestamp)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val enriched = StreamingJoins.enrichStreamStatic(
      events.toDF().toDF("imp_id", "user_id", "imp_ts"), dim)
    val query = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      events.addData(Seq((100L, 1L, ts(0L)), (101L, 2L, ts(0L)), (102L, 7L, ts(0L))))
      query.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select(col("imp_id"), col("tier")).as[(Long, String)].collect().sorted
      assert(rows.toSeq == Seq((100L, "gold"), (101L, "basic"))) // 102: no dim row, inner join drops
    } finally query.stop()
  }
}
