package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import org.apache.spark.sql.graft.Bridge

/** `graft-delta-cdf` — a streaming CHANGE DATA FEED source over a
  * Delta table (VERDICT r14 #8): offsets are TABLE VERSIONS, each
  * micro-batch is [[DeltaRead.readChanges]] over the newly committed
  * version range, and the frames feed the exactly-once sinks
  * ([[DeltaWrite.appendSink]], [[GraftTable.upsertSink]]) — the
  * change-propagation loop users actually deploy:
  *
  * {{{
  *   spark.readStream.format("graft-delta-cdf")
  *     .option("path", srcTable)
  *     .option("startingVersion", "latest")   // or a number; default 0
  *     .load()
  *     .writeStream.option("checkpointLocation", ckpt)
  *     .foreachBatch(handler).start()
  * }}}
  *
  * Why the V1 `Source` seam and not a DSv2 `MicroBatchStream`: a CDF
  * batch is not a byte range — it is a WHOLE CATALYST PLAN (parquet
  * scans under column mapping, DV anti-joins, cdc-file reads, an
  * exceptAll derivation). `Source.getBatch` returns a DataFrame, so
  * that plan ships to executors verbatim; a DSv2 PartitionReader
  * would have to re-implement all of it row by row. This is the same
  * seam the production Delta connector's own streaming source uses —
  * the DSv2 custom-offset machinery is already proven end-to-end by
  * [[ReplaySource]].
  *
  * Semantics:
  *   - schema = table columns + `_change_type` + `_commit_version`
  *     (the [[DeltaRead.readChanges]] contract);
  *   - `startingVersion` N: the first batch begins at version N —
  *     version 0's adds surface as inserts, so `0` (the default)
  *     replays the table from creation; `"latest"` starts at the NEXT
  *     commit (changes only);
  *   - the source is STATELESS: `getOffset` always reports the
  *     table's current latest version and every batch range comes
  *     from the engine's checkpointed offset log, so a restart
  *     resumes exactly after the last committed batch — no internal
  *     cursor exists to regress (the [[ReplaySource]] r11 lesson,
  *     applied by construction);
  *   - a schema change or a vacuumed commit inside a batch range
  *     fails the stream BY NAME (the readChanges refusals) rather
  *     than emitting mis-bound or unattributable rows; restart with
  *     `startingVersion` past the break to resume.
  *
  * 100 TB shape: driver work per trigger is one log-tail listing
  * (manifest-scale); all row bytes move through the readChanges
  * plans' executor scans, commit-proportional per batch. */
class DeltaCdfSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta-cdf"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), DeltaCdfSource.cdfSchema(
      DeltaCdfSource.spark(sqlContext), DeltaCdfSource.root(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = DeltaCdfSource.spark(sqlContext)
    val root = DeltaCdfSource.root(parameters)
    // `latest` must resolve ONCE per stream, not once per (re)start:
    // a restart that re-resolved it would silently skip every foreign
    // commit that landed while the query was down. The resolved value
    // is pinned under the engine-provided metadataPath on first start
    // and read back forever after.
    val (starting, _) = DeltaCdfSource.pinnedStart(metadataPath) {
      parameters.get("startingVersion") match {
        case Some("latest") => (DeltaRead.latestVersion(root) + 1, "changes")
        case Some(s) => (s.toLong, "changes")
        case None => (0L, "replay")
      }
    }
    new DeltaCdfStream(spark, root, starting)
  }
}

object DeltaCdfSource {
  private[sources] def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-delta-cdf needs a path option (the Delta table root)"))

  /** The engine hands `metadataPath` as a `file:` URI string — treat
    * it as one, not as a relative filesystem path (which would pin
    * the starting version under the DRIVER'S CWD and break restart
    * resolution from any other working directory). */
  private[sources] def metadataDir(metadataPath: String): java.nio.file.Path =
    if (metadataPath.startsWith("file:"))
      java.nio.file.Paths.get(
        DeltaRead.percentDecode(metadataPath.stripPrefix("file:")))
    else java.nio.file.Paths.get(metadataPath)

  /** Resolve-once pin shared by both CDF sources: `(offset, mode)` is
    * computed on FIRST stream start and read back on every restart.
    * `mode` ("replay" vs "changes") is pinned alongside the offset so
    * batch construction never re-derives the start SEMANTICS from
    * live table state — re-deriving is how a `latest` start on a
    * single-commit table got mistaken for a history replay. */
  private[sources] def pinnedStart(metadataPath: String)
      (resolve: => (Long, String)): (Long, String) = {
    val pin = metadataDir(metadataPath).resolve("graft-cdf-start")
    if (java.nio.file.Files.exists(pin)) {
      val parts = java.nio.file.Files.readString(pin).trim.split(":", 2)
      (parts(0).toLong, if (parts.length > 1) parts(1) else "changes")
    } else {
      val (v, m) = resolve
      java.nio.file.Files.createDirectories(pin.getParent)
      java.nio.file.Files.writeString(pin, s"$v:$m")
      (v, m)
    }
  }

  private[sources] def spark(sqlContext: SQLContext): SparkSession =
    sqlContext.sparkSession

  private[sources] def cdfSchema(spark: SparkSession,
                                 root: String): StructType = {
    val meta = DeltaRead.state(spark, root, Long.MaxValue).meta
    StructType(meta.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

/** One version-range offset: the LAST version the batch includes. */
private case class CdfOffset(version: Long) extends OffsetV1 {
  override def json(): String = version.toString
}

private class DeltaCdfStream(spark: SparkSession, root: String,
                             startingVersion: Long) extends Source {

  override val schema: StructType = DeltaCdfSource.cdfSchema(spark, root)

  /** All available = the table's current latest version; None before
    * the starting version exists (a `latest`-started stream idles
    * until the next foreign commit). */
  override def getOffset: Option[OffsetV1] = {
    val latest = DeltaRead.latestVersion(root)
    if (latest < startingVersion) None else Some(CdfOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val lo = start.map(_.json().toLong + 1).getOrElse(startingVersion)
    val hi = end.json().toLong
    val batch =
      if (hi < lo) {
        // restart replay of an already-complete range boundary — an
        // empty frame under the change schema
        DeltaRead.readChanges(spark, root, hi, hi).limit(0)
      } else DeltaRead.readChanges(spark, root, lo, hi)
    Bridge.asStreaming(batch)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaCdfSource[$root]"
}
