package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming min/max decimation — the live feed of the batch
  * q_downsample_minmax query: per (key, event-time window), emit the
  * window's minimum-value and maximum-value events once the watermark
  * closes the window. The downstream dashboard store receives 2 rows
  * per key-window regardless of input rate — the spike-preserving
  * alternative to windowed averaging, at the same bounded-state cost.
  *
  * State is the built-in windowed-aggregation store: one (min, max)
  * candidate pair per open (key, window), evicted on watermark — no
  * custom state, no growth with event count. Ties break on event_id
  * via the struct ordering, exactly like the batch twin's rank
  * windows, so replaying the stream as a batch gives the same rows.
  */
object StreamingDecimation {

  /** Input: (user_id long, ts timestamp, event_id long, value double).
    * Output (Append mode, watermark-gated): one row per closed
    * (user_id, window) with both extremes. */
  def decimate(events: DataFrame,
               windowDur: String = "1 minute",
               watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), window(col("ts"), windowDur))
      .agg(
        min_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("min_event_id"),
        min(col("value")).as("min_value"),
        max_by(col("event_id"),
          struct(col("value"), negate(col("event_id"))))
          .as("max_event_id"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("window.start").as("win_start"),
        col("min_event_id"), col("min_value"),
        col("max_event_id"), col("max_value"), col("n_events"))
}
