package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q_slo_burn (EventOps.sloBurn): windowed
  * error-rate monitoring with integer-ppm rates and a budget-breach
  * flag, emitted as each window CLOSES via the watermark — the
  * on-call alert path, where the batch query is the backfill/audit
  * path. Sharing the rate arithmetic (exact truncating ppm over
  * integer counts, breach at 10 000 ppm = 1%) means an alert and its
  * postmortem backfill can never disagree on whether an hour
  * breached.
  *
  * State: one running (n_events, n_errors) pair per open window,
  * evicted once the watermark passes the window end — bounded by
  * windows-in-flight, never by history. Append mode emits a window
  * exactly once, when it is final.
  */
object StreamingSloBurn {

  /** events: (ts timestamp, event_type string) post-parse projection.
    * windowLength defaults to the batch op's hour grid. */
  def sloBurn(events: DataFrame, windowLength: String = "1 hour",
              watermarkDelay: String = "10 seconds",
              breachPpm: Long = 10000L): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("long").as("n_errors"))
      .select(col("window.start").as("win_start"),
        col("n_events"), col("n_errors"),
        expr("""cast(cast(n_errors as decimal(38,0)) * 1000000
          div n_events as bigint)""").as("error_ppm"))
      .withColumn("breach",
        when(col("error_ppm") > breachPpm, 1L).otherwise(0L))
}
