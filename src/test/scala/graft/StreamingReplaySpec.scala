package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StreamingAnomaly, StreamingCuration,
  StreamingDecimation, StreamingTransitions}

/** Replay harness (VERDICT r5 item 4): the streaming wrappers fed the
  * DRIVER'S testdata through MemoryStream micro-batches must equal
  * their batch twins — the only previously-unverified surface, since
  * the oracle gate hash-checks the batch queries but never replayed a
  * stream against them.
  *
  *  - decimation and transitions compare against the ORACLED batch
  *    queries themselves (q_downsample_minmax / q_event_transitions),
  *    so the chain is stream ≡ batch ≡ DuckDB;
  *  - anomaly scores RUNNING stats (each event against its key's
  *    prior history) — definitionally different from the oracled
  *    retrospective q_anomaly_zscore — so its replay asserts the
  *    stream equals the pure per-key sequential fold over the full
  *    ordered history (micro-batch-split invariance at corpus scale);
  *  - curation compares against the batch evaluation of the SAME
  *    scored/dedup/window expressions (the pipeline's front half;
  *    the batch q_curation_pipeline adds a stratified cap the live
  *    intake path deliberately doesn't apply).
  *
  * Replays chunk the input in event-time order (the arrival order a
  * resumed-from-checkpoint source would deliver); driver testdata has
  * zero same-(user, millisecond) collisions at sf0.001/sf0.01, so the
  * ms-resolution stream ordering is unambiguous vs the µs batch sort.
  */
class StreamingReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Feed `rows` through `make` in `chunks` event-time-ordered
    * micro-batches (+ sentinel batches to push the watermark past
    * every real window) and return the sink table. */
  private def replay[T: org.apache.spark.sql.Encoder](
      rows: Seq[T], chunks: Int, name: String,
      sentinels: Seq[T], make: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[T]
    val query = make(stream.toDS().toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // watermark advances off the PREVIOUS batch's max event time,
      // so two sentinel rounds flush every real window
      sentinels.foreach { sent =>
        stream.addData(Seq(sent))
        query.processAllAvailable()
      }
      spark.table(name)
    } finally query.stop()
  }

  private def events: DataFrame =
    Tables.events(spark, sf)

  test("decimation replay equals the oracled q_downsample_minmax") {
    import spark.implicits._
    val in = events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val maxUs = in.map(_._2).max
    val sentinels = Seq(
      (-1L, maxUs + 7200L * 1000000L, -1L, 0.0),
      (-1L, maxUs + 7300L * 1000000L, -2L, 0.0))
    val got = replay(in, 5, "decim_replay", sentinels, df =>
      StreamingDecimation.decimate(
        df.select(col("_1").as("user_id"),
          expr("timestamp_micros(_2)").as("ts"),
          col("_3").as("event_id"), col("_4").as("value")),
        windowDur = "1 hour"))
      .where(col("user_id") >= 0L)
      .select(col("user_id"),
        expr("unix_micros(win_start) div 3600000000").as("bucket_hr"),
        col("min_event_id"), col("min_value"),
        col("max_event_id"), col("max_value"))
      .collect().flatMap { r =>
        Seq((r.getLong(0), r.getLong(1), "min", r.getLong(2), r.getDouble(3)),
          (r.getLong(0), r.getLong(1), "max", r.getLong(4), r.getDouble(5)))
      }.toSet
    val want = SparkEntry.queries("q_downsample_minmax")(spark, sf)
      .collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("bucket_hr"),
          r.getAs[String]("kind"), r.getAs[Long]("event_id"),
          r.getAs[Double]("value"))
      }.toSet
    assert(got.nonEmpty && got == want)
  }

  test("transitions replay aggregates to the oracled q_event_transitions") {
    import spark.implicits._
    val in = events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val got = replay(in, 5, "trans_replay", Seq.empty, df =>
      StreamingTransitions.transitions(spark,
        df.select(col("_1").as("user_id"),
          expr("timestamp_micros(_2)").as("ts"),
          col("_3").as("event_id"), col("_4").as("event_type")),
        idleTimeout = "3650 days").toDF())
      .groupBy(col("fromType"), col("toType")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val want = SparkEntry.queries("q_event_transitions")(spark, sf)
      .collect().map { r =>
        ((r.getAs[String]("from_type"), r.getAs[String]("to_type")),
          r.getAs[Long]("cnt"))
      }.toMap
    assert(got.nonEmpty && got == want)
  }

  test("anomaly replay equals the per-key sequential fold over full history") {
    import spark.implicits._
    val in = events
      .select(col("user_id"), col("ts_us"), col("value"))
      .orderBy("ts_us")
      .as[(Long, Long, Double)].collect().toSeq
    val got = replay(in, 7, "anom_replay", Seq.empty, df =>
      StreamingAnomaly.detect(spark,
        df.select(col("_1").as("user_id"),
          expr("timestamp_micros(_2)").as("ts"), col("_3").as("value")),
        minN = 5L, threshold = 2.0, idleTimeout = "3650 days").toDF())
      .select(col("userId"), col("tsMs"), col("value"), col("z"))
      .as[(Long, Long, Double, Double)].collect().toSet
    val want = in.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(_._2).map(e => (e._1, e._2 / 1000L, e._3))
      StreamingAnomaly.scoreSlice(
        StreamingAnomaly.RunStats(0L, 0.0, 0.0, 0L), ordered, 5L, 2.0)._2
    }.map(a => (a.userId, a.tsMs, a.value, a.z)).toSet
    assert(want.nonEmpty, "threshold too strict: fold flagged nothing")
    assert(got == want)
  }

  test("curation replay equals the batch run of the same expressions") {
    import spark.implicits._
    val baseUs = 1700000000L * 1000000L
    val in = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
      .map { case (id, lang, text) => (id, baseUs + id * 1000000L, lang, text) }
    val maxUs = in.map(_._2).max
    // watermark delay 30 days > the whole replay span: the nh-dedup
    // state survives end to end (global keep-first), and the sentinels
    // land far enough out to flush every 1-second window
    val sentinels = Seq(
      (-1L, maxUs + 31L * 86400L * 1000000L, "zz", "sentinel"),
      (-2L, maxUs + 32L * 86400L * 1000000L, "zz", "sentinel"))
    val got = replay(in, 5, "cura_replay", sentinels, df =>
      StreamingCuration.curate(
        df.select(col("_1").as("doc_id"),
          expr("timestamp_micros(_2)").as("ts"),
          col("_3").as("lang"), col("_4").as("text")),
        watermarkDelay = "30 days"))
      .where(col("lang") =!= "zz")
      .collect().map { r =>
        (r.getAs[String]("lang"), r.getAs[Timestamp]("win_start").getTime,
          r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("sum_quality_u"))
      }.toSet
    val batch = in.toDF("doc_id", "ts_us", "lang", "text")
      .select(col("doc_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("lang"), col("text"))
    val keepFirst = Window.partitionBy(col("nh")).orderBy(col("doc_id"))
    val want = StreamingCuration.scored(batch)
      .withColumn("rn", row_number().over(keepFirst)).where(col("rn") === 1)
      .groupBy(col("lang"), window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        sum(col("quality_u")).cast("long").as("sum_quality_u"))
      .select(col("lang"), col("window.start").as("win_start"),
        col("n_docs"), col("sum_tokens"), col("sum_quality_u"))
      .collect().map { r =>
        (r.getAs[String]("lang"), r.getAs[Timestamp]("win_start").getTime,
          r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("sum_quality_u"))
      }.toSet
    assert(got.nonEmpty && got == want)
  }

  test("sessionize replay equals the oracled q_sessionize") {
    import spark.implicits._
    val in = events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val maxUs = in.map(_._2).max
    // sentinels 2h+ past the last event close every 30-min-gap session
    val sentinels = Seq(
      (-1L, maxUs + 7200L * 1000000L, -1L, 0.0),
      (-1L, maxUs + 7300L * 1000000L, -2L, 0.0))
    val got = graft.streaming.StreamingSessionize // session spans cross
      .sessionize _ // micro-batch boundaries: 7 chunks force merges
    val streamed = replay(in, 7, "sess_replay", sentinels, df =>
      got(df.select(col("_1").as("user_id"),
        expr("timestamp_micros(_2)").as("ts"),
        col("_3").as("event_id"), col("_4").as("value")),
        "30 minutes", "10 seconds"))
      .where(col("user_id") >= 0L)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))
      }.toMap
    // chain: stream ≡ the ORACLED batch q_sessionize (≡ DuckDB) on
    // the exact columns; avg_value vs the exact micro-unit sum agrees
    // to the 1e-6 the double avg carries
    val want = SparkEntry.queries("q_sessionize")(spark, sf).collect().map { r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us")) ->
        (r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("avg_value"))
    }.toMap
    assert(streamed.nonEmpty && streamed.keySet == want.keySet)
    streamed.foreach { case (k, (endUs, n, sumU)) =>
      val (wEnd, wN, wAvg) = want(k)
      assert(endUs == wEnd && n == wN, s"session $k bounds/count diverge")
      assert(math.abs(sumU.toDouble / 1e6 / n - wAvg) <= 1e-6,
        s"session $k value sum diverges")
    }
  }
}
