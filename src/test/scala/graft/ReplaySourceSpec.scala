package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.{LoadGen, StreamSource}
import graft.streaming.{DataDrivenWindow, StreamingCompat}
import graft.streaming.DataDrivenWindow.{CompatPoint, CompatRow}

/** The custom DSv2 `graft-replay` source (VERDICT r9 item 6) driven
  * end-to-end: LoadGen corpus → MicroBatchStream offsets/planning/
  * partitioned readers → `StreamSource.raw`'s normalized surface →
  * compat windows, checked against a driver-side fold of the SAME
  * micro-batch chunking through DataDrivenWindow.replay — the
  * public-Source-API twin of the MemoryStream replay harness. */
class ReplaySourceSpec extends SparkSpec {

  private val Num = 4000L
  private val RowsPerBatch = 1000

  private def freshCorpus(): String = {
    val dir = Files.createTempDirectory("graft_replay_corpus").toString
    // files=1: global line order == id order == event-time order, so
    // the chunk twin below is unambiguous
    LoadGen.generate(spark, dir, Num, intervalMs = 10L, files = 1)
    dir
  }

  test("replay source delivers the corpus exactly once, rate-limited") {
    val dir = freshCorpus()
    val q = spark.readStream.format("graft-replay")
      .option("path", dir).option("rowsPerBatch", RowsPerBatch.toString)
      .option("numPartitions", "2").load()
      .writeStream.format("memory").queryName("replay_all")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("replay_all")
    assert(got.count() === Num)
    assert(got.select("seq").distinct().count() === Num)
    // seq is the global line index — dense 0..N−1
    assert(got.agg(min("seq"), max("seq")).collect()(0)
      .toSeq === Seq(0L, Num - 1))
    // every row is the canonical envelope (parses with a Timestamp)
    val parsed = got.select(from_json(col("value"),
        graft.sources.JsonEvents.schema).as("p"))
      .where(col("p.Timestamp").isNotNull).count()
    assert(parsed === Num)
    // rate limit respected: no micro-batch exceeded rowsPerBatch
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.nonEmpty && sizes.forall(_ <= RowsPerBatch),
      s"batch sizes ${sizes.mkString(",")} exceed $RowsPerBatch")
    assert(sizes.length >= (Num / RowsPerBatch).toInt,
      "corpus arrived in fewer batches than the rate limit allows")
  }

  test("mid-corpus checkpoint restart delivers the corpus exactly once") {
    // VERDICT r10 #7: the offset contract (ReplayOffset = rows
    // delivered so far; deserializeOffset restores it) documented
    // exact mid-corpus resume but no test ever restarted a query
    // from a checkpoint. Stop the query part-way through the paced
    // replay, restart from the SAME checkpoint into the SAME file
    // sink, and require the union to be the corpus exactly once —
    // no re-delivered prefix, no skipped span.
    val dir = freshCorpus()
    val ckpt = Files.createTempDirectory("graft_replay_ckpt").toString
    val out = Files.createTempDirectory("graft_replay_out").toString
    def start() = spark.readStream.format("graft-replay")
      .option("path", dir).option("rowsPerBatch", RowsPerBatch.toString)
      .option("numPartitions", "2").load()
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    // wait until SOME batches committed but the corpus is NOT done —
    // the pacing (rowsPerBatch 1000 of 4000) guarantees a window
    val deadline = System.currentTimeMillis + 60000
    while (Option(q1.lastProgress).forall(_.batchId < 1) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    q1.stop()
    val committedRows = spark.read.parquet(out).count()
    assert(committedRows > 0, "premise: stop landed before any commit")
    assert(committedRows < Num,
      "premise broken: the whole corpus was delivered before the stop")

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === Num,
      s"restart lost or duplicated rows: ${got.count()} != $Num")
    assert(got.select("seq").distinct().count() === Num,
      "restart re-delivered an already-committed span")
    assert(got.agg(min("seq"), max("seq")).collect()(0)
      .toSeq === Seq(0L, Num - 1), "corpus not dense after restart")
  }

  test("compat windows over graft-replay equal the chunked batch fold") {
    val dir = freshCorpus()
    // the full pipeline, through StreamSource.raw's option surface —
    // exactly how a kafka deployment wires it, different format string
    val raw = StreamSource.raw(spark, "graft-replay",
      Map("path" -> dir, "rowsPerBatch" -> RowsPerBatch.toString,
        "numPartitions" -> "2"))
    val q = StreamingCompat.windows(spark,
        StreamSource.compatPoints(spark, raw))
      .toDF().writeStream.format("memory").queryName("replay_compat")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("replay_compat")
      .select("key", "tsUs", "avgValues").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).mkString(","))).toSet

    // twin: the corpus lines in the SAME rowsPerBatch chunks through
    // the SAME per-key replay fold the stream runs
    val lines = Files.lines(Paths.get(dir).resolve(
        Files.list(Paths.get(dir)).iterator.asScala
          .map(_.getFileName.toString)
          .filter(n => !n.startsWith(".") && !n.startsWith("_"))
          .toSeq.sorted.head), StandardCharsets.UTF_8)
      .iterator.asScala.toVector
    val points = spark.createDataset(lines.zipWithIndex.map {
        case (l, i) => (l, i.toLong) })(
        org.apache.spark.sql.Encoders.product[(String, Long)])
      .toDF("value", "seq")
    val parsed = StreamSource.compatPoints(spark, points).collect().toVector
      .sortBy(_.seq)
    val state = collection.mutable.Map.empty[String, DataDrivenWindow.KeyState]
    val out = Vector.newBuilder[CompatRow]
    parsed.grouped(RowsPerBatch).foreach { chunk =>
      chunk.groupBy(_.key).toSeq.foreach { case (k, slice) =>
        val sorted = slice.sortBy(p => (p.tsUs, p.seq))
        val (next, row) = DataDrivenWindow.processBatch(
          state.getOrElse(k, DataDrivenWindow.emptyState), sorted)
        state.update(k, next)
        out ++= row
      }
    }
    val want = out.result()
      .map(r => (r.key, r.tsUs, r.avgValues.mkString(","))).toSet
    assert(want.nonEmpty, "twin fold emitted nothing — test is vacuous")
    assert(got === want,
      s"stream/fold diverged: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }
}
