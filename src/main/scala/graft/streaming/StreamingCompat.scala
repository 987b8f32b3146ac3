package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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
  * growing), so the compat wrapper keeps the defect.
  */
object StreamingCompat {

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
