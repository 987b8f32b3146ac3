package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q_dau_stickiness's DAU half: per-day distinct
  * active users emitted as each day CLOSES via the watermark — the
  * live dashboard path, where the batch query is the backfill/audit
  * path. Distinctness comes from `dropDuplicatesWithinWatermark` on
  * (user_id, day): the first event a user emits in a day survives,
  * every later same-day event is dropped by the state store, so the
  * downstream day window counts exactly the batch op's distinct
  * (user, day) frame.
  *
  * State: one dedup entry per (user, day) inside the watermark
  * horizon + one count per open day window — bounded by active users
  * × days-in-flight, never by history. The delay must COVER the day
  * span (default 25 h) for exact parity: `dropDuplicates
  * WithinWatermark` only guarantees dedup inside the horizon, so a
  * shorter delay trades exactness for state (a user whose first
  * event has aged out of the horizon counts again — approximate
  * DAU, upper bound). That users × ~2 days of state is irreducible
  * for EXACT streaming distinct-per-day; the sketch fallback is a
  * per-day HLL register fold (q_approx_distinct's portable
  * registers) in constant state. Append mode emits a day exactly
  * once, when it is final; the rolling-WAU half of the batch op is a
  * 7-day re-aggregation of these emitted rows, deliberately left to
  * the consumer so the per-day state stays minimal.
  */
object StreamingDau {

  /** events: (ts timestamp, user_id long) post-parse projection. */
  def dau(events: DataFrame,
          watermarkDelay: String = "25 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .dropDuplicatesWithinWatermark(Seq("user_id", "day"))
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).cast("long").as("dau"))
      .select(expr("unix_micros(window.start) div 86400000000")
        .as("day"), col("dau"))
}
