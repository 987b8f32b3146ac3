package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-sessionization — the live twin of the batch
  * q_sessionize query (EventOps.sessionize: 30-minute-gap sessions
  * via lag + running sum): Structured Streaming's native
  * `session_window` merges each user's events into gap-bounded
  * sessions in the state store and emits one row per session once the
  * watermark passes the session's close (last event + gap).
  *
  * Why `session_window` and not a custom flatMapGroupsWithState: the
  * built-in merging-session state is exactly this semantics, the
  * state store holds one (start, end, agg) triple per OPEN session —
  * bounded by concurrent sessions, not event count — and sessions
  * that span micro-batches merge automatically (replay-asserted in
  * StreamingReplaySpec). Custom state would re-implement all of it.
  *
  * The session value sum ships as exact decimal-routed micro-units
  * (BIGINT) rather than a running double average: partial-aggregation
  * order differs between a micro-batched stream and a batch window,
  * so an IEEE double sum would drift at the ulp level across replays;
  * the decimal sum is order-independent, making stream ≡ batch an
  * exact integer equality (the q_ewma_smooth discipline).
  */
object StreamingSessionize {

  /** Input: (user_id long, ts timestamp, event_id long, value double).
    * Output (Append mode, watermark-gated): one row per CLOSED
    * session — (user_id, session_start_us, session_end_us, n_events,
    * sum_value_u) where sum_value_u is the session's value sum in
    * exact 1e-6 units. */
  def sessionize(events: DataFrame,
                 gap: String = "30 minutes",
                 watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        (sum(col("value").cast("decimal(18,6)")) * lit(1000000))
          .cast("long").as("sum_value_u"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("last_ts")).as("session_end_us"),
        col("n_events"), col("sum_value_u"))
}
