package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.{ParquetLayout, StreamSource}
import graft.streaming.StreamingCompat

/** The COMPLETE reference lifecycle as ONE test (VERDICT r03 item 7):
  * ingest → parse → demux → data-driven 1 s window → sink,
  * `/root/reference/src/DispatcherFunction/DispatcherFunction.cs:21-161`,
  * wired end to end instead of per-stage:
  *
  *   rate source (Event Hub stand-in, R1)     StreamSource.raw
  *     → JSON envelope parse (R2-R4)          StreamSource.compatPoints
  *     → per-key demux + data-driven window   StreamingCompat.windows
  *       (R9-R21, flatMapGroupsWithState)
  *     → JSON-row sink → at-rest landing      ParquetLayout.streamToPartitioned
  *       (hive-partitioned by session)
  *     → batch query over the landed history with planning-time
  *       directory pruning (the ingest topology every graft.ops
  *       query assumes).
  */
class StreamingLifecycleSpec extends SparkSpec {

  test("rate → parse → compat windows → partitioned landing → pruned batch read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lifecycle").toString + "/landed"

    val raw = StreamSource.raw(spark, "rate",
      Map("rowsPerSecond" -> "400", "numPartitions" -> "2"))
    val windows = StreamingCompat.windows(
      spark, StreamSource.compatPoints(spark, raw))
    val query = ParquetLayout
      .streamToPartitioned(windows.toDF(), dir, Seq("sessionId"))
      .start()

    def landedNonEmpty: Boolean =
      Files.exists(Paths.get(dir)) &&
        scala.util.Try(!spark.read.parquet(dir).isEmpty).getOrElse(false)
    try {
      // rate-source event time is wall-clock: run until at least one
      // key accumulates > 1 s of events and its window closes + lands
      val deadline = System.currentTimeMillis() + 60000
      while (!landedNonEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(landedNonEmpty, "no compat window landed in 60s")

    val landed = ParquetLayout.readPartitioned(spark, dir)

    // window rows carry the reference's envelope semantics through:
    // key = "{SessionId}:{Values[1]}" (cs:180), schema from first row
    val rows = landed.select("key", "sessionId", "tsUs", "names", "avgValues")
      .as[(String, String, Long, Seq[String], Seq[String])].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (key, sess, _, _, _) =>
      key.matches("sess-\\d+:\\d+") && key.startsWith(sess + ":") })
    assert(rows.forall(_._4 == Seq("speed", "player")))
    // averaged measurement re-stringified (cs:148) and in range
    assert(rows.forall(_._5.head.toDouble >= 0.0))
    assert(rows.forall(_._5.head.toDouble < 100.0))

    // data-driven window law (cs:87,90-92): a key's next window starts
    // at the first event >= start + 1s, so per-key window ts are >= 1s apart
    rows.groupBy(_._1).values.foreach { ws =>
      val ts = ws.map(_._3).sorted
      ts.zip(ts.tail).foreach { case (a, b) =>
        assert(b - a >= 1000000L, s"windows ${a} and ${b} closer than 1s")
      }
    }

    // planning-time pruning over the landed history: a session filter
    // must select only that session's directories
    val someSession = rows.head._2
    val pruned = landed.where(col("sessionId") === someSession)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    val selected = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString).toSeq
    assert(selected.nonEmpty &&
      selected.forall(_.contains(s"sessionId=$someSession")),
      s"scan should touch only $someSession dirs, got $selected")

    // and the landed history answers a normal batch aggregation
    val perSession = landed
      .select(col("sessionId"),
        element_at(col("avgValues"), 1).cast("double").as("speed"))
      .groupBy("sessionId").agg(avg("speed").as("avg_speed"), count(lit(1)).as("n"))
      .collect()
    assert(perSession.nonEmpty)
    assert(perSession.forall(r => r.getAs[Long]("n") > 0))
  }
}
