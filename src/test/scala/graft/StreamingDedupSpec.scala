package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** Live exact-dedup admission: first arrival per content hash wins,
  * duplicates within the watermark horizon are dropped, and replaying
  * the driver's documents table gives the batch q_exact_dedup's
  * admitted set (stream ≡ batch ≡ DuckDB, since q_exact_dedup is
  * oracled). */
class StreamingDedupSpec extends SparkSpec {

  private val base = 1700000000000L // ms
  private def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  /** Feed each chunk as its own micro-batch (processAllAvailable
    * between adds — without it MemoryStream coalesces every pending
    * add into ONE batch and the watermark never advances). */
  private def run(name: String)(
      chunks: Seq[Seq[(Long, Timestamp, String)]]): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingDedup.dedup(
      stream.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
      spark.table(name)
    } finally query.stop()
  }

  test("first arrival wins across micro-batches; later copies drop") {
    val out = run("dedup_first")(Seq(
      Seq((1L, ts(1), "alpha"), (2L, ts(2), "beta")),
      Seq((3L, ts(3), "alpha"), (4L, ts(4), "gamma")),
      Seq((5L, ts(5), "beta"), (6L, ts(6), "alpha"))))
    val admitted = out.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(admitted == Set((1L, "alpha"), (2L, "beta"), (4L, "gamma")))
  }

  test("state evicts at the watermark: a repeat past the horizon re-admits") {
    // state for "alpha" expires at ts(1)+1h. The filler batch's commit
    // advances the watermark to ts(9000)−1h = past that expiry and
    // evicts the state, so the next "alpha" re-admits (and starts a
    // fresh horizon: the 4th batch's copy is ITS duplicate, dropped).
    val out = run("dedup_evict")(Seq(
      Seq((1L, ts(1), "alpha")),
      Seq((2L, ts(9000), "filler")),
      Seq((3L, ts(9100), "alpha")),
      Seq((4L, ts(9200), "alpha"))))
    val alphaIds = out.where(col("text") === "alpha")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(alphaIds == Set(1L, 3L))
  }

  test("documents replay admits exactly the oracled q_exact_dedup set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val baseUs = 1700000000L * 1000000L
    val in = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
      .map { case (id, text) =>
        (id, new Timestamp(baseUs / 1000L + id), text) }
    val stream = MemoryStream[(Long, Timestamp, String)]
    // watermark 30 days > the whole replay span: state survives end to
    // end, so the stream computes GLOBAL keep-first like the batch
    val query = StreamingDedup.dedup(
      stream.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("dedup_replay")
      .outputMode(OutputMode.Append).start()
    try {
      in.grouped(120).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
    } finally query.stop()
    val got = spark.table("dedup_replay")
      .select("content_hash", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = SparkEntry.queries("q_exact_dedup")(spark, sf)
      .select("content_hash", "keep_doc_id", "n_copies")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // one admission per distinct hash, same hash set as the batch
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._1).toSet == want.map(_._1).toSet)
    // copies arriving in distinct micro-batches admit the batch's
    // keep-first (min doc_id); a same-batch collision has no arrival
    // order, so only singleton-or-split hashes pin the exact id
    val chunkOf = in.zipWithIndex.map { case ((id, _, _), i) => id -> i / 120 }
      .toMap
    val idsByHash = SparkEntry.queries("q_dedup_corpus")(spark, sf)
    val hashToIds = Tables(spark, sf, "documents")
      .select(sha2(col("text"), 256).as("h"), col("doc_id"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val gotByHash = got.toMap
    var pinned = 0
    want.foreach { case (h, keepId, _) =>
      val ids = hashToIds(h)
      val allDistinctChunks =
        ids.map(chunkOf).distinct.length == ids.length
      if (allDistinctChunks) { pinned += 1
        assert(gotByHash(h) == keepId,
          s"hash $h admitted ${gotByHash(h)}, batch keeps $keepId")
      }
    }
    assert(pinned > 0, "no hash had its copies in distinct micro-batches")
  }
}
