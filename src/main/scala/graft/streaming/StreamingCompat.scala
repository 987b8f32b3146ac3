package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.DataDrivenWindow._

/** Structured Streaming form of the reference pipeline: Event Hub →
  * demux → per-player data-driven 1 s window → averaged row
  * (DispatcherFunction.cs Run/ProcessPlayerAsync/PushTimeAsync), as
  * `readStream → groupByKey → flatMapGroupsWithState → writeStream`.
  *
  * The per-key micro-batch handler is DataDrivenWindow.replay — the
  * SAME code the batch operator uses; GroupState[KeyState] carries the
  * window start + pending queue across micro-batches exactly as the
  * reference's Redis keys do (cs:70-71). WindowPropertySpec's
  * split-equivalence property proves replay(whole) ==
  * replay(chunk1) ⊕ replay(chunk2), i.e. output is independent of
  * micro-batch boundaries.
  *
  * Fidelity choice: NoTimeout — the reference never expires its queue
  * (README.md:79, a documented defect). A production deployment would
  * set an event-time timeout to evict idle keys; that changes emitted
  * results (final partial windows still never emit, but state stops
  * growing), so the default compat wrapper keeps the defect.
  *
  * TTL variant (`windowsTtl` / conf `spark.graft.compat.ttl`, r8):
  * mirrors the reference's ACTUAL expiry semantics, which are narrower
  * than "1-day state TTL": only the START key carries the
  * TimeSpan.FromDays(1) TTL, and only when first initialized
  * (DispatcherFunction.cs:78); every boundary advance rewrites it with
  * `StringSetAsync(key, value)` and NO expiry (cs:90), which in Redis
  * PERSISTS the key — clears the TTL for good. The queue key never
  * has a TTL. So: a key that ever advanced its start never expires; a
  * key that never crossed a boundary loses its start 1 day after
  * first sight, and on its next event the start re-initializes (with
  * a fresh TTL) while the STALE QUEUE is still there — a later drain
  * then spans the idle gap from the old queue head. The variant
  * reproduces exactly that (timeout drops the start, keeps the
  * queue), using event-time as the replayable proxy for the
  * reference's Redis wall clock. StreamingCompatTtlSpec pins the
  * emitted-row delta vs NoTimeout.
  */
object StreamingCompat {

  /** TTL seconds for the never-advanced start key; unset/empty = the
    * reference-defect NoTimeout path. */
  val TtlConf = "spark.graft.compat.ttl"

  /** NoTimeout KeyState + the start key's expiry deadline (event-time
    * µs): Some at init, cleared forever by the first advance (the
    * reference's persist-on-set), None while no start exists. */
  case class TtlState(inner: KeyState, deadlineUs: Option[Long])

  /** Conf-dispatched entry: `spark.graft.compat.ttl` = TTL in seconds
    * enables the expiry-faithful variant, unset keeps the
    * reference-defect NoTimeout replay. */
  def windowsConfigured(spark: SparkSession, points: Dataset[CompatPoint]): Dataset[CompatRow] =
    spark.conf.getOption(TtlConf).map(_.trim).filter(_.nonEmpty) match {
      case Some(secs) => windowsTtl(spark, points, secs.toLong * 1000000L)
      case None => windows(spark, points)
    }

  /** EventTimeTimeout form of `windows` (see class Scaladoc): on
    * timeout the key's start is dropped and its queue KEPT, exactly
    * the reference's expired-start/immortal-queue state.
    *
    * One structural deviation EventTimeTimeout forces: it requires a
    * watermark, and Spark drops rows at-or-before the watermark
    * BEFORE the operator (the reference, with no watermark concept,
    * would enqueue them). With the default 0-second delay an in-order
    * stream only ever loses an event whose timestamp exactly equals
    * the previous batch's max; raise `delay` if the source can be
    * out-of-order across micro-batches. */
  def windowsTtl(spark: SparkSession, points: Dataset[CompatPoint],
                 ttlUs: Long, delay: String = "0 seconds"): Dataset[CompatRow] = {
    import spark.implicits._
    points
      .withColumn("evt_time", expr("timestamp_micros(tsUs)"))
      .withWatermark("evt_time", delay)
      .as[CompatPoint]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TtlState, CompatRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[CompatPoint], state: GroupState[TtlState]) =>
          val prev = state.getOption.getOrElse(TtlState(emptyState, None))
          if (state.hasTimedOut) {
            // cs:78 expiry: only the start key dies; the queue stays
            state.update(TtlState(KeyState(None, prev.inner.queue), None))
            Iterator.empty
          } else {
            val sorted = it.toVector.sortBy(p => (p.tsUs, p.seq))
            val (next, row) = processBatch(prev.inner, sorted)
            val deadline =
              if (sorted.isEmpty) prev.deadlineUs
              else prev.inner.startUs match {
                // init-on-first-event sets the 1-day TTL (cs:78);
                // any advance within the same batch persists the key
                case None if next.startUs.contains(sorted.head.tsUs) =>
                  Some(sorted.head.tsUs + ttlUs)
                case Some(s) if next.startUs.contains(s) => prev.deadlineUs
                case _ => None // advanced → TTL cleared for good (cs:90)
              }
            state.update(TtlState(next, deadline))
            // re-arm each invocation (Spark clears it per call); clamp
            // above the watermark so a deadline the watermark already
            // passed fires on the next batch instead of throwing
            deadline.foreach(d => state.setTimeoutTimestamp(
              math.max(d / 1000, state.getCurrentWatermarkMs + 1)))
            row.iterator
          }
      }
  }

  /** Attach the compat window computation to any (streaming or batch)
    * Dataset[CompatPoint]. One micro-batch = one reference batch (the
    * Functions trigger model maps 1:1): each key's slice is sorted
    * (cs:35) and run through ONE processBatch — so at most one window
    * closes per key per micro-batch, exactly like the reference. */
  def windows(spark: SparkSession, points: Dataset[CompatPoint]): Dataset[CompatRow] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, CompatRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[CompatPoint], state: GroupState[KeyState]) =>
          val prev = state.getOption.getOrElse(emptyState)
          val sorted = it.toVector.sortBy(p => (p.tsUs, p.seq))
          val (next, row) = processBatch(prev, sorted)
          state.update(next)
          row.iterator
      }
  }
}
