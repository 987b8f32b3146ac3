package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.{DeltaRead, DeltaWrite, StreamSource}
import graft.util.Json

/** VERDICT r13 #3: the exactly-once streaming story retargeted at a
  * table FOREIGN engines read — `graft-replay` DSv2 stream →
  * `foreachBatch` → [[DeltaWrite.appendSink]], whose dedup state is
  * the Delta protocol's own SetTransaction ledger rather than a
  * GraftTable manifest marker. The crash is simulated at the worst
  * window (the ReplayLifecycleSpec geometry): the Delta commit landed
  * but the checkpoint's batch-commit marker didn't, so the restart
  * REPLAYS a batch whose rows are already in the table; the txn gate
  * must make that replay a no-op visible to ANY conformant Delta
  * reader — zero duplicate rows at every log version. */
class DeltaStreamSinkSpec extends SparkSpec {

  private val ChunkRows = 1000

  test("replay stream → txn-gated Delta append: exactly-once across a " +
      "sink-side crash, at every version") {
    import spark.implicits._

    // growable corpus of plain numbered lines — micro-batch boundaries
    // are a property of the file layout, not timing
    val corpus = Files.createTempDirectory("graft_dsink_corpus").toString
    def appendChunk(i: Int): Unit =
      Files.write(Paths.get(corpus, f"part-$i%03d.txt"),
        (i * ChunkRows until (i + 1) * ChunkRows)
          .map(n => s"line-$n").mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))

    val root = Files.createTempDirectory("graft_dsink_delta").toString
    // nullable columns: the streaming frame's are, and the writer
    // refuses nullable-into-required
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType)))
    DeltaWrite.create(spark, spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row("seed", -1L)), 1), seedSchema), root)

    val ckpt = Files.createTempDirectory("graft_dsink_ckpt").toString
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      StreamSource.raw(spark, "graft-replay",
        Map("path" -> corpus, "rowsPerBatch" -> ChunkRows.toString,
          "numPartitions" -> "2"))
        .writeStream
        .foreachBatch(DeltaWrite.appendSink(root, appId = "dsink-spec"))
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()

    // ---- batch 0 ----------------------------------------------------
    appendChunk(0)
    val q0 = start(org.apache.spark.sql.streaming.Trigger.Once())
    try assert(q0.awaitTermination(120000)) finally q0.stop()
    val st0 = DeltaRead.read(spark, root)
    assert(st0.count() == ChunkRows + 1)

    // ---- CRASH: Delta commit landed, checkpoint marker didn't --------
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
    Files.deleteIfExists(commits.resolve(".0.crc"))

    // ---- restart: batch 0 REPLAYS (txn gate skips), chunk 1 commits --
    appendChunk(1)
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try q1.processAllAvailable() finally q1.stop()

    // zero duplicates at the LATEST version…
    val fin = DeltaRead.read(spark, root).where($"seq" >= 0)
    assert(fin.count() == 2L * ChunkRows)
    assert(fin.select("seq").distinct().count() == 2L * ChunkRows)
    assert(fin.select("value").collect().map(_.getString(0)).toSet ==
      (0 until 2 * ChunkRows).map(n => s"line-$n").toSet)

    // …and at EVERY version a conformant reader can time-travel to
    val latest = DeltaRead.latestVersion(root)
    (0L to latest).foreach { v =>
      val at = DeltaRead.read(spark, root, v.toInt).where($"seq" >= 0)
      assert(at.count() == at.select("seq").distinct().count(),
        s"version $v holds duplicate rows")
    }

    // the ledger in the log is spec-shaped: one txn per committed batch
    val txnVersions = (0L to latest).flatMap { v =>
      Files.readAllLines(
        Paths.get(root, "_delta_log", f"$v%020d.json"), StandardCharsets.UTF_8)
        .asScala.filter(_.trim.nonEmpty)
        .map(Json.parse(_).asInstanceOf[Map[String, Any]])
        .flatMap(_.get("txn"))
        .map(t => (Json.str(t, "appId").get, Json.long(t, "version").get))
    }
    assert(txnVersions == Seq(("dsink-spec", 0L), ("dsink-spec", 1L)),
      s"expected one SetTransaction per committed micro-batch: $txnVersions")
  }
}
