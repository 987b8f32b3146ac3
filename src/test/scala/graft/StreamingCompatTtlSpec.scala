package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DataDrivenWindow, StreamingCompat}
import graft.streaming.DataDrivenWindow._

/** Pins the reference's start-key expiry semantics
  * (DispatcherFunction.cs:78,90 — 1-day TTL set at init only, cleared
  * for good by the first advance, queue immortal) and EXACTLY which
  * emitted rows differ from the NoTimeout defect-faithful default.
  *
  * Timeline (base B = day 10 — event times must sit above the initial
  * watermark; TTL 1 day; key "a" advances early so its TTL clears,
  * key "b" idles past its TTL):
  *   batch1  a@B v=1, b@B v=5   both init start B, deadline B+1d
  *   batch2  a@B+2d v=2         a advances → TTL cleared; drains
  *                              [a@B, a@B+2d] → ("a", B, "1.5");
  *                              watermark → B after this batch
  *   batch3  a@B+2d+1s v=3      a advances again; underflow (queue
  *                              can't span 1s) → loss, no emit.
  *                              Watermark is now B+2d > b's deadline
  *                              B+1d → b TIMES OUT this batch: start
  *                              dropped, QUEUE [b@B] KEPT
  *   batch4  b@B+3d v=7         TTL: start re-inits at B+3d, fresh
  *                                deadline B+4d → no boundary → NO
  *                                window yet;
  *                              NoTimeout: start still B → crosses →
  *                                drains [b@B, b@B+3d] → avg 6 NOW
  *   batch5  b@B+3d+0.5s v=9    within 1 s of both variants' starts
  *   batch6  b@B+3d+1.5s v=11   TTL: crosses (1.5s from B+3d) →
  *                                drains the STALE queue: head b@B,
  *                                boundary b@B+3d → ("b", B, "6") —
  *                                the idle gap rides the immortal
  *                                queue, the reference's defect;
  *                              NoTimeout: crosses from B+3d →
  *                                drains [b@B+3d+0.5s, b@B+3d+1.5s]
  *                                → ("b", B+3d+0.5s, "10")
  * Delta: same window SET minus the post-gap pair window — NoTimeout
  * emits ("b",B,"6") at batch4 plus ("b",B+3d+0.5s,"10") at batch6;
  * the TTL variant emits only ("b",B,"6"), and two batches later.
  */
class StreamingCompatTtlSpec extends SparkSpec {

  private val D = 86400000000L // 1 day in µs
  private val B = 10 * D

  private def pt(key: String, tsUs: Long, seq: Long, v: String): CompatPoint =
    CompatPoint(key, tsUs, seq, "dev", "sess", Seq("v"), Seq(v))

  private val batches = Seq(
    Seq(pt("b", B, 0, "5"), pt("a", B, 0, "1")),
    Seq(pt("a", B + 2 * D, 1, "2")),
    Seq(pt("a", B + 2 * D + 1000000L, 2, "3")),
    Seq(pt("b", B + 3 * D, 1, "7")),
    Seq(pt("b", B + 3 * D + 500000L, 2, "9")),
    Seq(pt("b", B + 3 * D + 1500000L, 3, "11")))

  private val ttlWant = Vector(("a", B, "1.5"), ("b", B, "6"))

  private def collectRows(table: String): Vector[(String, Long, String)] = {
    import spark.implicits._
    spark.table(table).as[CompatRow].collect()
      .map(r => (r.key, r.tsUs, r.avgValues.head))
      .sortBy(r => (r._1, r._2)).toVector
  }

  private def runTtl(): Vector[(String, Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CompatPoint]
    val query = StreamingCompat.windowsTtl(spark, stream.toDS(), D)
      .writeStream.format("memory").queryName("compat_ttl_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      collectRows("compat_ttl_out")
    } finally query.stop()
  }

  test("expired start drops, queue survives, drain spans the idle gap") {
    val got = runTtl()
    // a's first advance clears its TTL (cs:90 persists the key):
    // exactly the one pre-gap window, never a timeout afterwards
    assert(got.filter(_._1 == "a") == Vector(("a", B, "1.5")))
    // b: exactly ONE window, closed at batch6, spanning the stale
    // queue head b@B through b@B+3d — (5+7)/2 = 6
    assert(got.filter(_._1 == "b") == Vector(("b", B, "6")))
  }

  test("delta vs NoTimeout is exactly the post-expiry window set") {
    // the defect-faithful fold over the same per-key batch sequence
    val noTimeout = Seq("a", "b").flatMap { k =>
      val perKey = batches.map(_.filter(_.key == k).sortBy(p => (p.tsUs, p.seq)))
      DataDrivenWindow.replay(emptyState, perKey.iterator)._2
    }.map(r => (r.key, r.tsUs, r.avgValues.head))
      .sortBy(r => (r._1, r._2)).toVector
    // NoTimeout: b's start (never expired) is crossed by b@B+3d at
    // batch4 → ("b",B,"6") two batches earlier; batch6 then drains
    // the post-gap pair → an EXTRA ("b", B+3d+0.5s, "10")
    assert(noTimeout == ttlWant :+ ("b", B + 3 * D + 500000L, "10"))
    assert(runTtl() == ttlWant)
  }

  test("windowsConfigured dispatches on the conf") {
    spark.conf.set(StreamingCompat.TtlConf, "86400")
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[CompatPoint]
      val query = StreamingCompat.windowsConfigured(spark, stream.toDS())
        .writeStream.format("memory").queryName("compat_conf_out")
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        assert(collectRows("compat_conf_out") == ttlWant)
      } finally query.stop()
    } finally spark.conf.unset(StreamingCompat.TtlConf)
  }
}
