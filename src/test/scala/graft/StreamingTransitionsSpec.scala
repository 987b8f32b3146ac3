package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingTransitions
import graft.streaming.StreamingTransitions.LastSeen

/** Bounded-state streaming transitions: the previous event type is
  * carried across micro-batches, first events emit nothing, keys are
  * independent, the pure fold is micro-batch-split invariant, and
  * equal-timestamp events break ties by event_id exactly like the
  * batch twin's lag window.
  */
class StreamingTransitionsSpec extends SparkSpec {

  private val base = 1700000000000L
  private def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  test("transitions pair each event with its key's previous event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val events = stream.toDF().toDF("user_id", "ts", "event_id", "event_type")
    val query = StreamingTransitions.transitions(spark, events)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 view->click; user 2's lone event emits nothing
      stream.addData(Seq(
        (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "click"),
        (2L, ts(0), 12L, "view")))
      query.processAllAvailable()
      val b1 = spark.table("trans_out")
        .select(col("userId"), col("fromType"), col("toType"))
        .as[(Long, String, String)].collect().toSet
      assert(b1 == Set((1L, "view", "click")))

      // batch 2: both keys continue — state crossed the batch boundary
      stream.addData(Seq((1L, ts(5), 13L, "purchase"), (2L, ts(5), 14L, "error")))
      query.processAllAvailable()
      val b2 = spark.table("trans_out")
        .select(col("userId"), col("fromType"), col("toType"))
        .as[(Long, String, String)].collect().toSet
      assert(b2 == Set(
        (1L, "view", "click"), (1L, "click", "purchase"),
        (2L, "view", "error")))
    } finally query.stop()
  }

  test("the fold core is micro-batch-split invariant") {
    val events = (0 until 12).map(i =>
      (3L, base + i * 1000L, 100L + i, Seq("view", "click", "purchase")(i % 3)))
    val (sWhole, tWhole) = StreamingTransitions.foldSlice(None, events)
    val (s1, t1) = StreamingTransitions.foldSlice(None, events.take(5))
    val (s2, t2) = StreamingTransitions.foldSlice(s1, events.drop(5))
    assert(sWhole == s2)
    assert(tWhole == t1 ++ t2)
    assert(tWhole.length == 11) // n events -> n-1 transitions
    assert(sWhole.contains(LastSeen("purchase", base + 11000L)))
  }

  test("equal-timestamp events order by event_id, not event_type") {
    // same ts for both events; event_id order (7 then 8) says
    // "zebra" precedes "apple" — a type-ordered fold would flip it
    val events = Seq(
      (4L, base, 8L, "apple"), (4L, base, 7L, "zebra"))
    val (st, out) = StreamingTransitions.foldSlice(None, events)
    assert(out.map(t => (t.fromType, t.toType)) == Vector(("zebra", "apple")))
    assert(st.contains(LastSeen("apple", base)))
  }
}
