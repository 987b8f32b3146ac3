package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingTransitions
import graft.streaming.StreamingTransitions.LastSeen

/** Bounded-state streaming transitions: the previous event type is
  * carried across micro-batches, first events emit nothing, keys are
  * independent, and the pure fold is micro-batch-split invariant.
  */
class StreamingTransitionsSpec extends SparkSpec {

  private val base = 1700000000000L
  private def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  test("transitions pair each event with its key's previous event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, String)]
    val events = stream.toDF().toDF("user_id", "ts", "event_type")
    val query = StreamingTransitions.transitions(spark, events)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 view->click; user 2's lone event emits nothing
      stream.addData(Seq(
        (1L, ts(0), "view"), (1L, ts(1), "click"), (2L, ts(0), "view")))
      query.processAllAvailable()
      val b1 = spark.table("trans_out")
        .select(col("userId"), col("fromType"), col("toType"))
        .as[(Long, String, String)].collect().toSet
      assert(b1 == Set((1L, "view", "click")))

      // batch 2: both keys continue — state crossed the batch boundary
      stream.addData(Seq((1L, ts(5), "purchase"), (2L, ts(5), "error")))
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
      (3L, base + i * 1000L, Seq("view", "click", "purchase")(i % 3)))
    val (sWhole, tWhole) = StreamingTransitions.foldSlice(None, events)
    val (s1, t1) = StreamingTransitions.foldSlice(None, events.take(5))
    val (s2, t2) = StreamingTransitions.foldSlice(s1, events.drop(5))
    assert(sWhole == s2)
    assert(tWhole == t1 ++ t2)
    assert(tWhole.length == 11) // n events -> n-1 transitions
    assert(sWhole.contains(LastSeen("purchase", base + 11000L)))
  }
}
