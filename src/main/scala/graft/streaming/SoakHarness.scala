package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.StreamSource

/** Replayable throughput soak for the compat pipeline — the harness
  * behind StreamingSoakSpec (bounded-state/lag asserts on the shared
  * test session) and the `graft.Soak` main (the real ≥ 100 events/s/
  * key bar at the driver's local[32] bench shape). Drives `keys` keys
  * at `hz` events/s/key for `batches` seconds of EVENT time through
  * the full pipeline — JSON envelope → compatPoints parse → per-key
  * demux → data-driven 1 s window (flatMapGroupsWithState) — one
  * micro-batch per event-time second, the reference's
  * trigger-per-buffer model (DispatcherFunction.cs:21-33).
  * MemoryStream makes the load wall-clock-independent: two runs see
  * byte-identical batches. */
object SoakHarness {

  case class Report(stateRows: Seq[Long], wallSec: Seq[Double],
                    emitted: Seq[Long], totalSec: Double,
                    progressEntries: Int) {
    /** Aggregate events/s over the whole run (includes warmup). */
    def eventsPerSec(keys: Int, hz: Int): Double =
      stateRows.size.toLong * keys * hz / totalSec
    /** Steady-state events/s: first two batches excluded (codegen +
      * state-store init warmup) — the SUSTAINED number the reference
      * bar is about. */
    def steadyEventsPerSec(keys: Int, hz: Int): Double = {
      val steady = wallSec.drop(2)
      steady.size.toLong * keys * hz / steady.sum
    }
  }

  private val BaseUs = 1767225600000000L // 2026-01-01T00:00:00Z

  private val streamIds = new java.util.concurrent.atomic.AtomicInteger(7000)

  /** Same pipeline fed through the `graft-replay` DSv2 CONNECTOR
    * instead of MemoryStream — the soak variant that exercises the
    * source seam (offset admission at `rowsPerBatch`, partition
    * planning, file-order replay) under the throughput bar. The
    * corpus is written once (spark.range → the same envelope
    * expression, text files in range order so event time is monotone
    * like the MemoryStream feed), then ONE processAllAvailable drains
    * it; the admission control paces the same one-second-of-event-time
    * micro-batches as the paced loop, and per-batch walls come from
    * the engine's own progress entries. NoTimeout only (the TTL
    * variants are state-store experiments, not source ones). */
  def runReplay(spark: SparkSession, keys: Int, hz: Int, batches: Int,
                queryName: String): Report = {
    import spark.implicits._
    val stepUs = 1000000L / hz
    def envelope(idCol: org.apache.spark.sql.Column) = to_json(struct(
      timestamp_micros(lit(BaseUs) + (idCol / keys).cast("long") * stepUs)
        .as("Timestamp"),
      concat(lit("dev-"), pmod(idCol, lit(3))).as("DeviceId"),
      concat(lit("sess-"), pmod(idCol, lit(keys))).as("SessionId"),
      lit("soak").as("SensorType"),
      array(lit("speed"), lit("player")).as("Names"),
      array(pmod(idCol, lit(100)).cast("string"),
        pmod(idCol, lit(keys)).cast("string")).as("Values")))
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_soak_replay_").toString
    val perBatch = keys.toLong * hz
    spark.range(perBatch * batches)
      .select(envelope(col("id")).as("value"))
      .write.mode("overwrite").text(corpus)
    val progressCap = math.max(100, 2 * batches + 16)
    val prevCap =
      spark.conf.getOption("spark.sql.streaming.numRecentProgressUpdates")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      progressCap.toString)
    try {
      val raw = StreamSource.raw(spark, "graft-replay", Map(
        "path" -> corpus,
        "rowsPerBatch" -> perBatch.toString,
        "numPartitions" -> spark.conf.get("spark.sql.shuffle.partitions")))
      val rows = StreamingCompat.windowsConfigured(
        spark, StreamSource.compatPoints(spark, raw))
      val q = rows.writeStream.format("noop").queryName(queryName)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        q.processAllAvailable()
        val totalSec = (System.nanoTime() - t0) / 1e9
        val progresses = q.recentProgress
        require(progresses.length < progressCap,
          s"recentProgress wrapped (${progresses.length} >= cap " +
            s"$progressCap) — per-batch numbers would be wrong")
        val data = progresses.filter(_.numInputRows > 0)
        require(data.length == batches,
          s"expected $batches data micro-batches from admission control, " +
            s"saw ${data.length} — the connector seam is not pacing")
        Report(
          data.map(_.stateOperators.head.numRowsTotal).toSeq,
          data.map(_.batchDuration / 1e3).toSeq,
          data.map(p => math.max(0L, p.sink.numOutputRows)).toSeq,
          totalSec,
          progresses.length)
      } finally q.stop()
    } finally {
      prevCap match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
      }
    }
  }

  /** `ttl` = Some(seconds) exercises the reference-faithful start-key
    * TTL variant (spark.graft.compat.ttl); None = the NoTimeout
    * defect-compat default. `queryName` must be unique per run in a
    * shared session (memory-sink table name). */
  def run(spark: SparkSession, keys: Int, hz: Int, batches: Int,
          ttl: Option[String], queryName: String): Report = {
    import spark.implicits._
    val stepUs = 1000000L / hz
    def envelope(idCol: org.apache.spark.sql.Column) = to_json(struct(
      timestamp_micros(lit(BaseUs) + (idCol / keys).cast("long") * stepUs)
        .as("Timestamp"),
      concat(lit("dev-"), pmod(idCol, lit(3))).as("DeviceId"),
      concat(lit("sess-"), pmod(idCol, lit(keys))).as("SessionId"),
      lit("soak").as("SensorType"),
      array(lit("speed"), lit("player")).as("Names"),
      array(pmod(idCol, lit(100)).cast("string"),
        pmod(idCol, lit(keys)).cast("string")).as("Values")))

    ttl.foreach(spark.conf.set(StreamingCompat.TtlConf, _))
    // recentProgress is a RING buffer (default 100 entries); the TTL
    // variant emits ~2 progress entries per batch (data + trailing
    // no-data watermark batch), so a long soak would silently drop
    // leading entries and corrupt the emitted-rows diffs. Size the
    // buffer to the run (2 entries/batch + slack) and assert below
    // that it never wrapped.
    val progressCap = math.max(100, 2 * batches + 16)
    val prevCap =
      spark.conf.getOption("spark.sql.streaming.numRecentProgressUpdates")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      progressCap.toString)
    try {
      // a MemoryStream batch is ONE partition unless told otherwise —
      // which would serialize the whole pre-shuffle JSON envelope +
      // parse on a single core; split it so the scan-side work
      // parallelizes like any real multi-partition source
      val mem = MemoryStream[Long](
        SoakHarness.streamIds.incrementAndGet(), spark,
        Some(spark.conf.get("spark.sql.shuffle.partitions").toInt))
      val raw = mem.toDF().select(envelope(col("value")).as("value"),
        col("value").as("seq"))
      val rows = StreamingCompat.windowsConfigured(
        spark, StreamSource.compatPoints(spark, raw))
      // noop sink: the soak measures the PIPELINE; a memory sink's
      // driver-side row collection added ~0.4 s/batch of pure
      // harness cost (progress metrics still report output rows)
      val q = rows.writeStream.format("noop").queryName(queryName)
        .outputMode("append").start()
      val stateRows = collection.mutable.ArrayBuffer[Long]()
      val wall = collection.mutable.ArrayBuffer[Double]()
      val emitted = collection.mutable.ArrayBuffer[Long]()
      val perBatch = keys.toLong * hz
      val t0 = System.nanoTime()
      try {
        var lastEmitted = 0L
        for (sec <- 0 until batches) {
          mem.addData(sec * perBatch until (sec + 1) * perBatch)
          val b0 = System.nanoTime()
          q.processAllAvailable()
          wall += (System.nanoTime() - b0) / 1e9
          // progress metrics, not a sink-table job — the soak loop
          // must not pay a growing count() scan per batch. The TTL
          // variant's EventTimeTimeout triggers a trailing no-data
          // micro-batch per watermark advance, so lastProgress alone
          // under-reports: sum sink rows across the (run-sized,
          // wrap-checked) progress buffer.
          val progresses = q.recentProgress
          require(progresses.length < progressCap,
            s"recentProgress wrapped (${progresses.length} >= cap " +
              s"$progressCap) — emitted counts would be wrong")
          stateRows += progresses.last.stateOperators.head.numRowsTotal
          // numOutputRows = -1 is the "unknown" sentinel (first
          // no-data batch); count it as 0
          val totalEmitted =
            progresses.map(p => math.max(0L, p.sink.numOutputRows)).sum
          emitted += totalEmitted - lastEmitted
          lastEmitted = totalEmitted
        }
        Report(stateRows.toSeq, wall.toSeq, emitted.toSeq,
          (System.nanoTime() - t0) / 1e9,
          // micro-batches actually run: the TTL variant's watermark
          // advance schedules a trailing no-data batch per iteration
          // (~2 entries/batch vs 1) — the measured source of its
          // per-batch overhead
          q.recentProgress.length)
      } finally q.stop()
    } finally {
      prevCap match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
      }
      ttl.foreach(_ => spark.conf.unset(StreamingCompat.TtlConf))
    }
  }
}
