package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import org.apache.spark.sql.graft.Bridge
import graft.util.Json

/** `graft-iceberg-cdf` — [[DeltaCdfSource]]'s Iceberg twin (r15):
  * a streaming change feed over an Iceberg table's snapshot ancestry.
  * Offsets are SNAPSHOT IDS; each micro-batch is
  * [[IcebergRead.readChanges]] over `(lastSnapshot, currentSnapshot]`
  * — inserts/deletes from files entering and leaving the live set
  * plus row-level visibility moves from position/equality delete
  * files — returned as the batch's own distributed Catalyst plan.
  *
  * {{{
  *   spark.readStream.format("graft-iceberg-cdf")
  *     .option("path", tableRoot)
  *     .option("startingSnapshot", "latest")   // or an id; default: oldest
  *     .load()
  * }}}
  *
  * Semantics:
  *   - schema = table columns + `_change_type` + `_commit_snapshot_id`
  *     (the readChanges contract);
  *   - default start is the OLDEST ancestor on the current chain, so
  *     history replays as inserts; `"latest"` starts after the
  *     current snapshot (changes only), pinned under the stream's
  *     metadataPath exactly like the Delta source's startingVersion;
  *   - stateless: getOffset reports the table's current snapshot id;
  *     the engine's offset-log equality check drives batch
  *     construction, and readChanges' own ancestry walk refuses a
  *     ROLLED-BACK lineage by name (a diff across a rewrite would
  *     fabricate changes) instead of emitting wrong rows;
  *   - an expired (snapshot-expired) boundary refuses the same way —
  *     restart with a fresh checkpoint past the break to resume.
  *
  * Snapshot ids are NOT required to be ordered: the engine compares
  * offsets by VALUE (its offset log), and every range is validated by
  * the ancestry walk, so a foreign table's random ids work as well as
  * this writer's sequential ones.
  *
  * 100 TB shape: driver work per trigger is one metadata-JSON read;
  * row bytes move through readChanges' commit-proportional executor
  * scans. */
class IcebergCdfSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-cdf"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), IcebergCdfSource.cdfSchema(IcebergCdfSource.root(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val root = IcebergCdfSource.root(parameters)
    // the start MODE is pinned with the offset: whether the first
    // batch replays the starting snapshot's own rows must never be
    // re-derived from live table state (a `latest` start on a
    // single-snapshot table would otherwise look identical to an
    // oldest-ancestor replay and emit the whole table as inserts)
    val (starting, mode) = DeltaCdfSource.pinnedStart(metadataPath) {
      parameters.get("startingSnapshot") match {
        case Some("latest") => (IcebergRead.currentSnapshotId(root), "changes")
        case Some(s) => (s.toLong, "changes")
        case None => (IcebergCdfSource.oldestAncestor(root), "replay")
      }
    }
    new IcebergCdfStream(sqlContext.sparkSession, root, starting,
      replayBase = mode == "replay")
  }
}

object IcebergCdfSource {
  private[sources] def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-iceberg-cdf needs a path option (the Iceberg table root)"))

  private[sources] def cdfSchema(root: String): StructType = {
    val meta = IcebergRead.currentMeta(root)
    val st = IcebergRead.snapState(meta, root,
      IcebergRead.currentSnapshotId(root))
    StructType(st.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_snapshot_id", LongType, nullable = false)))
  }

  /** The oldest ancestor on the current chain — `readChanges(oldest,
    * current]` replays everything after it, and the oldest snapshot's
    * OWN content surfaces by diffing it against an empty synthetic
    * base: the stream's first batch uses the `fromStart` path below. */
  private[sources] def oldestAncestor(root: String): Long = {
    val meta = IcebergRead.currentMeta(root)
    val snaps = Json.list(meta, "snapshots")
    val byId = snaps.map(s => Json.long(s, "snapshot-id")
      .getOrElse(sys.error("snapshot without snapshot-id")) -> s).toMap
    val cur = Json.long(meta, "current-snapshot-id")
      .getOrElse(sys.error(s"no current snapshot at $root"))
    Iterator.iterate(Option(cur))(
        _.flatMap(id => byId.get(id).flatMap(Json.long(_, "parent-snapshot-id"))))
      .takeWhile(_.exists(byId.contains)).map(_.get)
      .foldLeft(cur)((_, id) => id)
  }
}

private case class IceCdfOffset(snapshotId: Long) extends OffsetV1 {
  override def json(): String = snapshotId.toString
}

private class IcebergCdfStream(spark: SparkSession, root: String,
                               startingSnapshot: Long,
                               replayBase: Boolean) extends Source {

  override val schema: StructType = IcebergCdfSource.cdfSchema(root)

  override def getOffset: Option[OffsetV1] =
    Some(IceCdfOffset(IcebergRead.currentSnapshotId(root)))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val hi = end.json().toLong
    val batch = start match {
      case Some(s) =>
        val lo = s.json().toLong
        if (lo == hi) IcebergRead.readChanges(spark, root, hi, hi).limit(0)
        else IcebergRead.readChanges(spark, root, lo, hi)
      case None =>
        // first batch: (starting, hi] — plus the starting snapshot's
        // OWN rows as inserts when the PINNED mode is a history
        // replay (the oldest ancestor has no parent to diff against);
        // a changes-only start never replays, no matter what the
        // table's ancestry looks like by now
        val tail =
          if (startingSnapshot == hi)
            IcebergRead.readChanges(spark, root, hi, hi).limit(0)
          else IcebergRead.readChanges(spark, root, startingSnapshot, hi)
        if (replayBase) {
          import org.apache.spark.sql.functions.{col, lit}
          val base = IcebergRead.read(spark, root, startingSnapshot)
            .select(schema.fieldNames.dropRight(2).map(col).toIndexedSeq :+
              lit("insert").as("_change_type") :+
              lit(startingSnapshot).as("_commit_snapshot_id"): _*)
          base.unionByName(tail)
        } else tail
    }
    Bridge.asStreaming(batch)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"IcebergCdfSource[$root]"
}
