package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.{JsonEvents, LoadGen, StreamSource}

/** LoadGen (the Streamer.CLI analog) feeds the file-stream ingest
  * path: generated blobs parse clean in batch, and the text file
  * source streams them through StreamSource's generic normalization
  * into the compat window pipeline. */
class LoadGenSpec extends SparkSpec {

  test("generated corpus parses clean and is deterministic") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_loadgen").toString
    LoadGen.generate(spark, dir, num = 1000, intervalMs = 10, files = 2)
    val raw = spark.read.text(dir)
    assert(raw.count() == 1000)
    val (ok, dead) = JsonEvents.parse(raw)
    assert(dead.isEmpty)
    assert(ok.count() == 1000)
    // reproducible: a second run yields the identical blob multiset
    val dir2 = Files.createTempDirectory("graft_loadgen2").toString
    LoadGen.generate(spark, dir2, num = 1000, intervalMs = 10, files = 2)
    val a = raw.as[String].collect().sorted
    val b = spark.read.text(dir2).as[String].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("file stream over a generated corpus drives the compat windows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_loadgen_stream").toString
    // 10 ms spacing × 2000 events = 20 s of event time per key cycle —
    // plenty of >1 s jumps per session key to close windows
    LoadGen.generate(spark, dir, num = 2000, intervalMs = 10, files = 2)
    val points = StreamSource.compatPoints(spark,
      StreamSource.raw(spark, "text",
        Map("path" -> dir, "maxFilesPerTrigger" -> "1")))
    val query = graft.streaming.StreamingCompat.windows(spark, points)
      .writeStream.format("memory").queryName("loadgen_compat_out")
      .outputMode(OutputMode.Append).start()
    try {
      query.processAllAvailable()
      val rows = spark.table("loadgen_compat_out")
        .as[graft.streaming.DataDrivenWindow.CompatRow].collect()
      assert(rows.nonEmpty, "no compat window closed over the corpus")
      assert(rows.forall(_.key.matches("sess-\\d+:\\d+")))
    } finally query.stop()
  }
}
