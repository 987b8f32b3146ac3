package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.DataDrivenWindow
import graft.streaming.DataDrivenWindow.CompatPoint

/** Batch form of the reference's exact data-driven windowing
  * (R11–R14): `events` rows are lifted into the canonical DataPoint
  * envelope (names/values parallel string arrays, DataPoint.cs:25-28),
  * demuxed with groupByKey, and each key's event-time-ordered sequence
  * is replayed through DataDrivenWindow.replay — the same function the
  * Structured Streaming wrapper uses, so batch and stream cannot
  * diverge.
  *
  * There is deliberately NO DuckDB oracle: stateful data-driven
  * windows with the add-then-check drain are not SQL-expressible
  * (SURVEY §2.C). Correctness is covered by CompatWindowSpec /
  * WindowPropertySpec hand fixtures + properties; the driver records a
  * rows-only check.
  *
  * Scale note: this operator is sequential per key by definition (the
  * reference's semantics are a per-key FIFO replay) — parallelism
  * comes from the key shuffle, same as the reference's per-player
  * demux. The per-key sort-then-replay buffers one key's events in
  * executor memory, which matches the reference's own unbounded
  * per-player Redis queue (README.md:79); the aligned-window
  * EventOps forms are the scale path, this is the parity path.
  */
object CompatOps {

  def compatDatadrivenWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.events(s, dir)
      .select(
        col("user_id").cast("string").as("uid"),
        col("ts_us"), col("event_id"),
        col("event_type"),
        col("value").cast("string").as("value_str"))
      .as[(String, Long, Long, String, String)]
      .map { case (uid, tsUs, eventId, eventType, valueStr) =>
        CompatPoint(
          key = uid, // reference key = "{SessionId}:{Values[1]}" (cs:180)
          tsUs = tsUs, seq = eventId,
          deviceId = s"dev-$uid", sessionId = uid,
          names = Seq("value", "player", "type"),
          values = Seq(valueStr, uid, eventType))
      }
    pts.groupByKey(_.key)
      .flatMapGroups { (_, it: Iterator[CompatPoint]) =>
        // reference sorts each batch by Timestamp before demux (cs:35);
        // replay in 100-event micro-batches — the reference's real
        // delivery granularity (100 Hz sensors, ~100-event hub batches,
        // README.md:48,72-75). Batching choice is semantic here: one
        // drain happens per batch (cs:99-104).
        val sorted = it.toVector.sortBy(p => (p.tsUs, p.seq))
        DataDrivenWindow.replay(
          DataDrivenWindow.emptyState, sorted.grouped(100))._2.iterator
      }
      .flatMap(r => r.names.zip(r.avgValues).map { case (n, v) =>
        (r.key, r.tsUs, r.deviceId, r.sessionId, n, v)
      })
      .toDF("key", "win_ts_us", "deviceid", "sessionid", "name", "avg_value")
      .orderBy("key", "win_ts_us", "name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_compat_datadriven_window" -> compatDatadrivenWindow _)

  /** Intentionally empty — see class Scaladoc. */
  val oracles: Map[String, String] = Map.empty
}
