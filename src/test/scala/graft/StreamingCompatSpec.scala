package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DataDrivenWindow, StreamingCompat}
import graft.streaming.DataDrivenWindow._

/** True-streaming form of the compat window: MemoryStream micro-batches
  * through flatMapGroupsWithState must equal the pure batch fold over
  * the same per-key batch sequence (SURVEY §7.2 step 5 / §5.2 item 4).
  * One micro-batch = one reference ProcessPlayerAsync call, so at most
  * one window closes per key per micro-batch. */
class StreamingCompatSpec extends SparkSpec {

  private def pt(key: String, tsUs: Long, seq: Long, v: String): CompatPoint =
    CompatPoint(key, tsUs, seq, "dev", "sess", Seq("v"), Seq(v))

  test("MemoryStream micro-batches reproduce the batch fold, state carried across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      pt("a", 0L, 0, "10"), pt("a", 500000L, 1, "20"),
      pt("b", 0L, 0, "5"))
    val batch2 = Seq(
      pt("a", 1200000L, 2, "30"), pt("a", 1500000L, 3, "40"),
      pt("a", 2500000L, 4, "50"),
      pt("b", 2000000L, 1, "7"))

    val stream = MemoryStream[CompatPoint]
    val query = StreamingCompat.windows(spark, stream.toDS())
      .writeStream.format("memory").queryName("compat_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      assert(spark.table("compat_out").isEmpty) // nothing closed yet

      stream.addData(batch2)
      query.processAllAvailable()
      val got = spark.table("compat_out").as[CompatRow].collect()
        .sortBy(r => (r.key, r.tsUs)).toVector

      // reference: the same per-key batch sequence through the pure fold
      val want = Seq("a", "b").flatMap { k =>
        val perKey = Seq(batch1, batch2)
          .map(_.filter(_.key == k).sortBy(p => (p.tsUs, p.seq)))
        DataDrivenWindow.replay(emptyState, perKey.iterator)._2
      }.sortBy(r => (r.key, r.tsUs)).toVector

      assert(got == want)
      // hand-computed: a drains once in batch2 even though its start
      // advanced twice (0→1.2→2.5) — window [0, 0.5, 1.2] → avg 20;
      // b's window [0, 2.0] → avg 6; a's 1.5/2.5 stay queued
      assert(got.map(r => (r.key, r.tsUs, r.avgValues.head)) ==
        Vector(("a", 0L, "20"), ("b", 0L, "6")))
    } finally query.stop()
  }
}
