package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — the enrichment patterns a deployed event pipeline
  * needs around the reference's windowing core (the reference enriches
  * per-event via in-process lookups; on Spark the same capabilities
  * are declarative joins the planner distributes).
  *
  * Three canonical shapes:
  *   - stream × static dimension (broadcast hash join per micro-batch,
  *     no state store),
  *   - stream × stream inner within an event-time interval (both sides
  *     buffered in the state store, evicted by watermark + range bound),
  *   - stream × stream LEFT OUTER (same, plus null-padded emission of
  *     unmatched left rows once the watermark proves no match can
  *     arrive).
  *
  * At 100 TB/day the state bound is the whole game: the join range
  * condition is what lets Spark compute, per side, how long a row can
  * possibly still match, and drop it after — without it the state
  * store grows without bound and the query is rejected in Append mode.
  *
  * Input schemas (post-parse projections of a streaming source):
  *   impressions: (imp_id long, user_id long, imp_ts timestamp)
  *   clicks:     (click_id long, user_id long, click_ts timestamp)
  *   dim:        any static DataFrame keyed by user_id
  */
object StreamingJoins {

  /** Stream × static-dimension enrichment: the dimension is re-read
    * per micro-batch planning cycle and broadcast when small — no
    * streaming state at all. This is how bounded dims (nation/region
    * class tables) attach to an event stream. */
  def enrichStreamStatic(events: DataFrame, dim: DataFrame,
                         key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), key)

  /** Stream-stream INNER join: clicks attribute to an impression of
    * the same user within [imp_ts, imp_ts + attributionWindow]. Both
    * watermarks plus the time-range predicate bound the state store:
    * an impression row is droppable once the click watermark passes
    * imp_ts + window; a click row once the impression watermark passes
    * click_ts. */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      attributionWindow: String = "10 seconds",
                      watermarkDelay: String = "5 seconds"): DataFrame = {
    val imps = impressions.withWatermark("imp_ts", watermarkDelay)
    val clks = clicks.withWatermark("click_ts", watermarkDelay)
    imps.join(clks,
      imps("user_id") === clks("user_id") &&
        clks("click_ts") >= imps("imp_ts") &&
        clks("click_ts") <= imps("imp_ts") + expr(s"INTERVAL $attributionWindow"))
      .select(imps("imp_id"), imps("user_id"), imps("imp_ts"),
        clks("click_id"), clks("click_ts"))
  }

  /** Stream-stream LEFT OUTER variant: every impression is emitted —
    * matched rows as they join, unmatched rows null-padded only after
    * the click-side watermark passes imp_ts + window (the earliest
    * moment "no click" is a fact rather than "no click yet"). The
    * outer emission is therefore watermark-delayed by construction;
    * that latency is the price of a correct negative. */
  def attributeClicksLeftOuter(impressions: DataFrame, clicks: DataFrame,
                               attributionWindow: String = "10 seconds",
                               watermarkDelay: String = "5 seconds"): DataFrame = {
    val imps = impressions.withWatermark("imp_ts", watermarkDelay)
    val clks = clicks.withWatermark("click_ts", watermarkDelay)
    imps.join(clks,
      imps("user_id") === clks("user_id") &&
        clks("click_ts") >= imps("imp_ts") &&
        clks("click_ts") <= imps("imp_ts") + expr(s"INTERVAL $attributionWindow"),
      "leftOuter")
      .select(imps("imp_id"), imps("user_id"), imps("imp_ts"),
        clks("click_id"), clks("click_ts"))
  }
}
