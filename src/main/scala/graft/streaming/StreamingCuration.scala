package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch curation pipeline's front half
  * (LlmOps.curationPipeline): documents arriving on a stream are
  * quality-scored and filtered in a stateless projection, deduped by
  * normalized content hash within the watermark, and aggregated into
  * per-(language, window) corpus stats — the live intake path of a
  * training-data pipeline, where a batch recuration over the landed
  * corpus remains the source of truth (same split as the event path:
  * streaming for freshness, batch for exactness).
  *
  * State is bounded twice over: dropDuplicatesWithinWatermark keeps
  * per-hash state only until the watermark passes (a global
  * dropDuplicates would grow forever), and the windowed aggregate
  * evicts closed (lang, window) groups. The quality formula and the
  * normalization are the exact expressions the batch operators use,
  * so a document admitted by the stream is the same document the
  * batch pipeline would admit.
  *
  * Input schema: (doc_id long, ts timestamp, lang string,
  * text string) — a streaming source's post-parse projection. */
object StreamingCuration {

  private val stop = expr(
    "size(filter(toks, x -> x IN ('a','the','of','and','in'))) / cast(size(toks) as double)")
  private val ttr = expr(
    "size(array_distinct(toks)) / cast(size(toks) as double)")

  /** Quality-scored, filtered, hash-annotated stream — the stateless
    * prefix (reusable ahead of any downstream streaming stage). */
  def scored(docs: DataFrame, minQualityU: Long = 600000L): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("ts"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        floor((
          lit(0.4) * least(size(col("toks")).cast("double") / lit(100.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) - stop) +
          lit(0.3) * ttr) * lit(1000000.0)).as("quality_u"),
        sha2(trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), 256).as("nh"))
      .where(col("quality_u") >= minQualityU)

  /** Full path: score → filter → dedup-within-watermark → windowed
    * per-language stats (append mode; rows emit when the watermark
    * closes their window). */
  def curate(docs: DataFrame, watermarkDelay: String = "10 seconds",
             minQualityU: Long = 600000L): DataFrame =
    scored(docs, minQualityU)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("nh")
      .groupBy(col("lang"), window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        sum(col("quality_u")).cast("long").as("sum_quality_u"))
      .select(col("lang"), col("window.start").as("win_start"),
        col("n_docs"), col("sum_tokens"), col("sum_quality_u"))
}
