package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.DataDrivenWindow.{CompatPoint, CompatRow}

/** The reference's ingest + egress surface, Spark-first:
  *
  *  - R1 source: the reference consumes UTF-8 JSON event blobs from an
  *    Event Hub ([EventHubTrigger], DispatcherFunction.cs:21-23). The
  *    connector is environment-specific; everything after the bytes —
  *    parse, dead-letter, key synthesis — is here, over any
  *    DataFrame[value: string] (spark.read.text, readStream from
  *    Kafka/socket, MemoryStream, ...).
  *  - R2 parse: JSON → canonical DataPoint envelope (DataPoint.cs:8-28).
  *  - R4 dead-letter: malformed records are split out (not dropped
  *    silently — the reference logs them, cs:184-190) via PERMISSIVE
  *    mode's corrupt-record column.
  *  - R3 key synthesis: key = "{SessionId}:{Values[1]}" — the
  *    reference's "total hack" player-id assumption (cs:179-181),
  *    0-based Values[1] = element_at(..., 2).
  *  - R23 sink: the per-window output row serialized to the exact JSON
  *    shape of cs:152-161 (lowercase field names, always-empty
  *    sessionstart, allvalues as a string→string map).
  */
object JsonEvents {

  /** Canonical DataPoint envelope (DataPoint.cs:8-28) + corrupt-record
    * channel. JSON field names match the reference's serialization. */
  val schema: StructType = StructType(Seq(
    StructField("Timestamp", TimestampType),
    StructField("DeviceId", StringType),
    StructField("SessionId", StringType),
    StructField("SensorType", StringType),
    StructField("Names", ArrayType(StringType)),
    StructField("Values", ArrayType(StringType)),
    StructField("_corrupt_record", StringType)))

  /** Parse raw JSON events (column `value: string`) into the typed
    * envelope + demux key; malformed records go to the second return
    * (dead letter), matching SafelyConvertToDataPoint's (null, log)
    * split (cs:172-191). An event without Values[1] gets a null-suffix
    * key from concat_ws — the reference would throw there; keep such
    * events in the clean side (they parsed) and let the caller decide,
    * mirroring the "total hack" fragility without crashing the scan. */
  def parse(raw: DataFrame): (DataFrame, DataFrame) = {
    val parsed = raw.select(col("value"), from_json(col("value"), schema,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
    val ok = parsed
      .where(col("p._corrupt_record").isNull && col("p.Timestamp").isNotNull)
      .select(
        col("p.Timestamp").as("timestamp"),
        col("p.DeviceId").as("deviceId"),
        col("p.SessionId").as("sessionId"),
        col("p.SensorType").as("sensorType"),
        col("p.Names").as("names"),
        col("p.Values").as("values"),
        concat_ws(":", col("p.SessionId"), element_at(col("p.Values"), 2)).as("key"),
        col("value").as("raw"))
    val dead = parsed
      .where(col("p._corrupt_record").isNotNull || col("p.Timestamp").isNull)
      .select(col("value"))
    (ok, dead)
  }

  /** `parse` with SINGLE-PASS ingest metrics attached via the observe
    * API: total/clean/dead counts materialize as a side effect of
    * whatever action the caller already runs — no second scan. (The
    * reference pays an extra `points.Count()` iteration per metric,
    * DispatcherFunction.cs:25,37,49; `observe` is the engine-native
    * replacement.) Read `obs.get` AFTER an action on the clean frame. */
  def parseObserved(raw: DataFrame): (DataFrame, DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("ingest")
    val parsed = raw.select(col("value"), from_json(col("value"), schema,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
      .withColumn("is_dead",
        col("p._corrupt_record").isNotNull || col("p.Timestamp").isNull)
      .observe(obs,
        count(lit(1)).as("n_total"),
        count(when(!col("is_dead"), 1)).as("n_clean"),
        count(when(col("is_dead"), 1)).as("n_dead"))
    val ok = parsed.where(!col("is_dead"))
      .select(
        col("p.Timestamp").as("timestamp"),
        col("p.DeviceId").as("deviceId"),
        col("p.SessionId").as("sessionId"),
        col("p.SensorType").as("sensorType"),
        col("p.Names").as("names"),
        col("p.Values").as("values"),
        concat_ws(":", col("p.SessionId"), element_at(col("p.Values"), 2)).as("key"),
        col("value").as("raw"))
    val dead = parsed.where(col("is_dead")).select(col("value"))
    (ok, dead, obs)
  }

  /** Clean parsed events → Dataset[CompatPoint] for the window
    * pipeline. seq is a stable intra-key order: row_number over
    * (timestamp, content-hash of the raw blob) per key — a pure
    * function of the data, identical across runs/retries/partition
    * layouts (monotonically_increasing_id is NOT: it bakes in the
    * partition layout, so equal-ts replay order would differ run to
    * run). Equal-(ts, blob) duplicates remain interchangeable — and
    * are literally identical rows, so any order among them yields the
    * same windows. The window shuffle is on key, which the compat
    * pipeline regroups by anyway. */
  def toCompatPoints(spark: SparkSession, clean: DataFrame): Dataset[CompatPoint] = {
    import spark.implicits._
    val seqW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("tsUs"), sha2(col("raw"), 256))
    clean.select(
      col("key"),
      unix_micros(col("timestamp")).as("tsUs"),
      col("deviceId"), col("sessionId"), col("names"), col("values"),
      col("raw"))
      .withColumn("seq", row_number().over(seqW).cast("long"))
      .select(col("key"), col("tsUs"), col("seq"),
        col("deviceId"), col("sessionId"), col("names"), col("values"))
      .as[(String, Long, Long, String, String, Seq[String], Seq[String])]
      .map { case (key, tsUs, seq, dev, sess, names, values) =>
        CompatPoint(key, tsUs, seq, dev, sess,
          Option(names).getOrElse(Seq.empty), Option(values).getOrElse(Seq.empty))
      }
  }

  /** R23: window rows → the reference's output JSON (cs:152-161). */
  def toOutputJson(spark: SparkSession, rows: Dataset[CompatRow]): Dataset[String] = {
    import spark.implicits._
    rows.select(to_json(struct(
      expr("timestamp_micros(tsUs)").as("ts"),
      col("deviceId").as("deviceid"),
      col("sessionId").as("sessionid"),
      col("sessionStart").as("sessionstart"),
      map_from_arrays(col("names"), col("avgValues")).as("allvalues"))).as("json"))
      .as[String]
  }
}
