package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transitions — the live feed of the batch
  * q_event_transitions matrix: each arriving event pairs with its
  * key's PREVIOUS event type, emitting (from, to) rows a downstream
  * windowed count turns into the rolling Markov view.
  *
  * State per key is ONE value (last event type + its event time) —
  * the minimum any order-1 transition view needs, constant no matter
  * how long the key's history; the state store holds O(live keys).
  * Idle keys are evicted by event-time timeout exactly like
  * [[StreamingAnomaly]]: after the watermark passes last-seen +
  * idleTimeout the key starts cold, deliberately NOT emitting a
  * stale cross-gap transition.
  *
  * Ordering matches the batch twin EXACTLY: slices sort by
  * (event time, event_id) — the same total order q_event_transitions'
  * lag window uses — so replaying a stream that contains
  * equal-timestamp events for a key emits the identical (from, to)
  * pairs (r5 ADVICE: the previous event-type tie-break could diverge).
  */
object StreamingTransitions {

  /** The whole per-key state: the previous event. */
  case class LastSeen(eventType: String, lastTsMs: Long)

  case class Transition(userId: Long, tsMs: Long, fromType: String, toType: String)

  /** Fold one key's micro-batch slice (event-time order, event_id
    * tie-break — the batch window's order) starting from `prev`;
    * events are (user_id, ts_ms, event_id, event_type). Returns the
    * updated state and the transitions. Pure function — shared by
    * the streaming wrapper and tests. */
  def foldSlice(prev: Option[LastSeen], events: Seq[(Long, Long, Long, String)])
      : (Option[LastSeen], Vector[Transition]) =
    events.sortBy(e => (e._2, e._3)).foldLeft((prev, Vector.empty[Transition])) {
      case ((st, out), (uid, tsMs, _, et)) =>
        val emitted = st match {
          case Some(LastSeen(f, _)) => out :+ Transition(uid, tsMs, f, et)
          case None                 => out
        }
        (Some(LastSeen(et, tsMs)), emitted)
    }

  /** Streaming wrapper. Input: (user_id long, ts timestamp, event_id
    * long, event_type string); watermark applied after the
    * normalizing projection (casting a watermarked column strips the
    * tag). */
  def transitions(spark: SparkSession, events: DataFrame,
                  idleTimeout: String = "1 hour",
                  watermarkDelay: String = "10 seconds"): Dataset[Transition] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Timestamp, Long, String)], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: no stale cross-gap transition later
            Iterator.empty
          } else {
            val batch = it.map(e => (e._1, e._2.getTime, e._3, e._4)).toVector
            val (next, out) = foldSlice(state.getOption, batch)
            next.foreach { n =>
              state.update(n)
              state.setTimeoutTimestamp(n.lastTsMs, idleTimeout)
            }
            out.iterator
          }
      }
  }
}
