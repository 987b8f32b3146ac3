package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingest for the flat analytics event shape (the `events` table's
  * schema) with the same error-tolerant split JsonEvents gives the
  * canonical JSON envelope: well-formed rows come back typed, rows
  * that fail type conversion land in a dead-letter frame with the raw
  * line preserved — the reference's log-don't-drop rule
  * (DispatcherFunction.cs:184-190) applied to a second wire format.
  *
  * Scale notes: CSV scans split by line ranges like any text source,
  * so ingest parallelizes per file chunk; PERMISSIVE mode keeps the
  * scan pipelined (no per-row exception control flow); the returned
  * frames are plain projections — schema enforcement happens inside
  * the scan, not in a downstream filter pass.
  */
object CsvEvents {

  /** Typed event schema + the corrupt-record channel. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt_record", StringType)))

  private val readerOpts = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record",
    "header" -> "true",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Batch read: (clean typed events, dead-letter rows with the raw
    * line). A row is dead-lettered when ANY field fails its type —
    * PERMISSIVE nulls the field and fills the corrupt-record column,
    * so the split is one isNull predicate, not a re-parse. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.options(readerOpts).schema(schema).csv(path)
      .cache() // one scan serves both sides of the split
    val clean = raw.where(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val dead = raw.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, dead)
  }

  /** File-stream read of a watched directory — the micro-batch ingest
    * path (R1's trigger shape over a file drop zone instead of an
    * Event Hub). Same schema/split contract as [[read]]; callers
    * fork the dead-letter side with `where` on the corrupt column. */
  def stream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.options(readerOpts).schema(schema).csv(dir)

  /** Egress twin: land a typed event frame as CSV with a header,
    * timestamps serialized in the reader's own format so a read-back
    * round-trips losslessly (spec-asserted). */
  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("header", "true")
      .option("timestampFormat", readerOpts("timestampFormat"))
      .mode("overwrite").csv(path)
}
