package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, LoadGen, StreamSource}
import graft.streaming.{DataDrivenWindow, StreamingCompat}
import graft.streaming.DataDrivenWindow.CompatRow

/** The COMPLETE r12 streaming story composed end-to-end (VERDICT r12
  * #4): LoadGen corpus → `graft-replay` DSv2 stream → compat windows
  * → [[GraftTable.upsertSink]] (the idempotent lakehouse CDC sink) →
  * [[GraftTable.pin]] → [[GraftTable.readStream]] from the pin — with
  * a CRASH mid-stream, simulated at the worst window: the sink's
  * merge COMMITTED but the checkpoint's batch-commit marker didn't
  * land (the commit file is deleted), so the restart REPLAYS a batch
  * whose effects are already in the table. Exactly-once into the sink
  * is then the batch-marker gate's job, and the final table must
  * equal the deterministic driver-side twin fold of the SAME
  * micro-batch chunking — and the pinned version streamed back must
  * equal its batch read.
  *
  * Determinism discipline (the ReplaySourceSpec geometry): the corpus
  * GROWS between self-terminating Trigger.Once runs, so micro-batch
  * boundaries are a property of the file layout, not of timing —
  * required because the compat fold is batch-sensitive by reference
  * defect (DispatcherFunction.cs:87-97). Green ≥5 consecutive runs is
  * the round's acceptance bar (driven from the build log, not the
  * spec). */
class ReplayLifecycleSpec extends SparkSpec {

  private val ChunkRows = 2000
  private val NumChunks = 2
  private val Num = (ChunkRows * NumChunks).toLong

  test("replay → compat → upsert sink → pin → stream-from-pin, exactly-once across a crash") {
    import spark.implicits._

    // ---- corpus, split into growable chunks -------------------------
    val staging = Files.createTempDirectory("graft_lc_stage").toString
    LoadGen.generate(spark, staging, Num, intervalMs = 10L, files = 1)
    val lines = {
      val f = {
        val ls = Files.list(Paths.get(staging))
        try Paths.get(staging).resolve(ls.iterator.asScala
          .map(_.getFileName.toString)
          .filter(n => !n.startsWith(".") && !n.startsWith("_"))
          .toSeq.sorted.head)
        finally ls.close()
      }
      val s = Files.lines(f, StandardCharsets.UTF_8)
      try s.iterator.asScala.toVector finally s.close()
    }
    val corpus = Files.createTempDirectory("graft_lc_corpus").toString
    def appendChunk(i: Int): Unit =
      Files.write(Paths.get(corpus, f"part-$i%03d.txt"),
        lines.slice(i * ChunkRows, (i + 1) * ChunkRows)
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

    // ---- the sink table: keyed by a surrogate of (window key, tsUs) —
    // window identity — seeded with a sentinel row so the first merge
    // has a base to prune against
    val gt = Files.createTempDirectory("graft_lc_gt").toString
    GraftTable.create(spark,  gt,
      Seq((-1L, "", -1L, "")).toDF("k", "key", "tsUs", "avg_s"), "k", 1)

    // windows → CDC-log shape for the idempotent sink (all inserts:
    // every window row is a new (key, tsUs) identity)
    def toCdc(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(
        xxhash64(col("key"), col("tsUs")).as("k"),
        lit("I").as("op"),
        col("tsUs"),
        col("key").as("new_key"),
        col("tsUs").as("new_tsUs"),
        concat_ws(",", col("avgValues")).as("new_avg_s"))
    val sink = GraftTable.upsertSink(gt, Seq("tsUs"))

    val ckpt = Files.createTempDirectory("graft_lc_ckpt").toString
    def start(trigger: org.apache.spark.sql.streaming.Trigger) = {
      val raw = StreamSource.raw(spark, "graft-replay",
        Map("path" -> corpus, "rowsPerBatch" -> ChunkRows.toString,
          "numPartitions" -> "2"))
      StreamingCompat.windows(spark, StreamSource.compatPoints(spark, raw))
        .toDF().writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
          sink(toCdc(df), id))
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
    }

    // ---- batch 0: chunk 0 only, self-terminating ---------------------
    appendChunk(0)
    val q0 = start(org.apache.spark.sql.streaming.Trigger.Once())
    try assert(q0.awaitTermination(120000)) finally q0.stop()
    assert(GraftTable.latest(gt).batch === 0L)

    // ---- CRASH at the worst window: the merge committed, the batch's
    // checkpoint commit marker didn't — delete it, so the restart
    // replays batch 0 against a table that already holds its effects
    val commits = Paths.get(ckpt, "commits")
    val newest = {
      val ls = Files.list(commits)
      try ls.iterator.asScala.toSeq
        .filter(p => p.getFileName.toString.matches("\\d+"))
        .maxBy(_.getFileName.toString.toLong)
      finally ls.close()
    }
    assert(newest.getFileName.toString === "0")
    Files.delete(newest)
    // the local checksum FS keeps a hidden CRC twin; a real crash
    // loses both, and leaving it would block the replay's re-commit
    Files.deleteIfExists(commits.resolve(".0.crc"))

    // ---- restart: batch 0 REPLAYS (sink must skip it — exactly-once),
    // then chunk 1 arrives and commits as batch 1
    appendChunk(1)
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try q1.processAllAvailable() finally q1.stop()
    assert(GraftTable.latest(gt).batch === 1L)

    // ---- the deterministic twin: same chunks through the same
    // per-key replay fold (the ReplaySourceSpec twin, CDC-projected)
    val points = spark.createDataset(lines.zipWithIndex.map {
        case (l, i) => (l, i.toLong) })(
        org.apache.spark.sql.Encoders.product[(String, Long)])
      .toDF("value", "seq")
    val parsed = StreamSource.compatPoints(spark, points).collect().toVector
      .sortBy(_.seq)
    val state = collection.mutable.Map.empty[String, DataDrivenWindow.KeyState]
    val twin = Vector.newBuilder[CompatRow]
    parsed.grouped(ChunkRows).foreach { chunk =>
      chunk.groupBy(_.key).toSeq.foreach { case (k, slice) =>
        val sorted = slice.sortBy(p => (p.tsUs, p.seq))
        val (next, row) = DataDrivenWindow.processBatch(
          state.getOrElse(k, DataDrivenWindow.emptyState), sorted)
        state.update(k, next)
        twin ++= row
      }
    }
    val want = twin.result()
      .map(r => (r.key, r.tsUs, r.avgValues.mkString(","))).toSet
    assert(want.nonEmpty, "twin fold emitted nothing — test is vacuous")

    val tableRows = GraftTable.read(spark, gt).where(col("k") =!= -1L)
      .select("key", "tsUs", "avg_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(tableRows.length === tableRows.distinct.length,
      "sink holds duplicate window rows — batch replay was re-applied")
    assert(tableRows.toSet === want,
      s"sink diverged from the twin fold: missing=" +
        s"${(want -- tableRows.toSet).take(3)} extra=" +
        s"${(tableRows.toSet -- want).take(3)}")

    // ---- pin the ingested version and stream it back ----------------
    val pinned = GraftTable.currentVersion(gt)
    GraftTable.pin(gt, pinned)
    val stage2 = Files.createTempDirectory("graft_lc_pinstage").toString
    val ckpt2 = Files.createTempDirectory("graft_lc_pinckpt").toString
    val out2 = Files.createTempDirectory("graft_lc_pinout").toString
    // parquet file sink: the memory sink refuses checkpoint recovery,
    // and the restart below is the point
    def startPin() =
      GraftTable.readStream(spark, gt, pinned, stage2, filesPerTrigger = 1)
        .writeStream.format("parquet").option("path", out2)
        .outputMode("append").option("checkpointLocation", ckpt2).start()
    val qp = startPin()
    try qp.processAllAvailable() finally qp.stop()
    // a later commit must NOT leak into the pinned replay: merge a new
    // row, then restart the pin stream from its checkpoint — no new data
    GraftTable.merge(spark, gt, Seq((99999L, "zz", 0L, "zz"))
      .toDF("k", "new_key", "new_tsUs", "new_avg_s")
      .withColumn("is_delete", lit(false)))
    val qp2 = startPin()
    try qp2.processAllAvailable() finally qp2.stop()

    val streamed = spark.read.parquet(out2)
    val batchRead = GraftTable.read(spark, gt, pinned)
    assert(streamed.count() === batchRead.count(),
      "pin replay lost/duplicated rows across restart or leaked later commits")
    assert(streamed.exceptAll(batchRead).isEmpty &&
      batchRead.exceptAll(streamed).isEmpty,
      "stream-from-pin != batch read of the pin")
  }
}
