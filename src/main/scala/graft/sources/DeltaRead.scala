package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.util.Json

/** Minimal read-side interop with the OPEN Delta Lake table protocol
  * (the published PROTOCOL.md at delta.io — no Delta library involved;
  * the transaction log is newline-delimited JSON and the checkpoint is
  * ordinary parquet, so Spark's own readers cover every byte). This
  * shrinks the declared storage-interop ceiling from "existing Delta
  * tables can't be read at all" to "writes still go through GraftTable
  * or a real Delta writer": a reference user can point this at the
  * lakehouse tables they already have.
  *
  * Layout read:
  *   <root>/_delta_log/00000000000000000000.json   versioned action
  *   <root>/_delta_log/<v>.checkpoint.parquet      log (add / remove /
  *   <root>/_delta_log/_last_checkpoint            metaData / protocol)
  * plus BOTH other checkpoint forms the protocol defines: classic
  * multi-part (`<v>.checkpoint.<i>.<n>.parquet` — all parts read as
  * one, incomplete sets refused by name) and V2
  * (`<v>.checkpoint.<uuid>.parquet|json` manifests whose file actions
  * live inline or in `_delta_log/_sidecars/<name>.parquet`;
  * checkpointMetadata must claim the manifest's own version).
  *
  * Reconstruction follows the spec: start from the newest checkpoint
  * at or below the requested version (if any), apply the JSON commits
  * after it in version order; a file is LIVE iff its last action is an
  * `add`; the newest `metaData` supplies schema + partition columns;
  * partition values live in the log (NOT the data files) and are
  * injected per file, cast to the declared types.
  *
  * Log-line parsing goes through [[graft.util.Json]] — a full
  * recursive-descent parse per action line (ADVICE r12: the previous
  * ad-hoc tokenizers keyed off the FIRST occurrence of `"path"` /
  * the first `}` after `partitionValues`, which a writer that orders
  * `stats` before `path`, a column literally named "path", or a
  * partition VALUE containing a brace would silently mis-read; field
  * order is not mandated by the spec, so only a real parse is sound).
  *
  * Scope (asserted, not assumed):
  *   - protocol `minReaderVersion` ≤ 3. Column mapping — THE
  *     reader-version-2 feature (PROTOCOL.md) — is supported in BOTH
  *     modes: `name` (the mode every table that ever RENAMED or
  *     DROPPED a column carries) scans under the physical parquet
  *     names from each field's `delta.columnMapping.physicalName`
  *     metadata and projects back to logical ones; `id` (r14) scans
  *     under parquet footer FIELD-ID resolution — each field's
  *     `delta.columnMapping.id` rides the read schema as
  *     `parquet.field.id` on a derived session with Spark's native
  *     field-id matching pinned on, the machinery proven on
  *     [[IcebergRead]]. Partition values are looked up under the
  *     physical key the spec mandates for the log in both modes.
  *     Mapped schemas missing their physicalName/id metadata refuse.
  *   - reader version 3 = TABLE FEATURES: the fold collects
  *     `readerFeatures` and proceeds only when every listed feature is
  *     implemented here — columnMapping, deletionVectors (file actions
  *     reconciled by the spec's (path, dv-uniqueId) logical-file key;
  *     deleted row positions dropped at scan time via [[DeltaDv]]),
  *     timestampNtz, vacuumProtocolCheck. UNKNOWN features refuse by
  *     name — the table-features safety model. Refuse loudly, never
  *     mis-read silently.
  *   - the commit sequence after the bootstrap checkpoint must be
  *     CONTIGUOUS (cpVersion+1, cpVersion+2, …; from 0 when no
  *     checkpoint survives): a gap means log entries were cleaned past
  *     a checkpoint this reader cannot use — e.g. a multi-part
  *     checkpoint (`<v>.checkpoint.<n>.<m>.parquet`), which is
  *     detected and named in the refusal rather than silently ignored.
  *
  * 100 TB shape: the log is manifest-scale (one action row per file —
  * the same arithmetic as [[GraftTable]]'s manifests); the driver
  * folds actions and plans one parquet scan per partition-value group,
  * while data bytes move only through executor-side parquet readers.
  * For EXTREME partition counts (a union of tens of thousands of
  * per-tuple scans would bloat the plan) the reader switches to ONE
  * flat `basePath` scan over the live-file list when the layout is
  * provably hive-style — see [[plan]] and
  * `spark.graft.delta.unionPartitionLimit`.
  */
object DeltaRead {

  /** `id`/`createdTime` are carried verbatim so [[DeltaWrite.checkpoint]]
    * can PRESERVE them (ADVICE r13: the spec's metaData id is immutable
    * for the table's lifetime — foreign streaming readers use it to
    * detect table replacement, so fabricating a fresh one per
    * checkpoint breaks them). */
  private[sources] case class Meta(schema: StructType,
                                   partitionCols: Seq[String],
                                   configuration: Map[String, String],
                                   id: String = "",
                                   createdTime: Option[Long] = None)

  /** The folded table state at a version: live files with their
    * log-supplied partition values, under the newest metaData.
    * `minReader`/`minWriter` ride along for [[DeltaWrite]]'s protocol
    * refusals and checkpoint preservation; `txns` is the folded
    * SetTransaction state (latest version per appId — the streaming
    * idempotence ledger); `stats` maps live paths to their add.stats
    * JSON for file skipping; `dvs` maps live paths to their deletion
    * vectors (at most one per path — the fold enforces it);
    * `readerFeatures`/`writerFeatures` are the folded table-features
    * sets (version-3/7 protocols), carried so [[DeltaWrite]] can gate
    * on and PRESERVE them. */
  private[sources] case class TableState(version: Long, meta: Meta,
      live: Seq[(String, Map[String, String])], minWriter: Long = 2L,
      minReader: Long = 1L, txns: Map[String, Long] = Map.empty,
      stats: Map[String, String] = Map.empty,
      dvs: Map[String, DeltaDv.DvDescriptor] = Map.empty,
      readerFeatures: Set[String] = Set.empty,
      writerFeatures: Set[String] = Set.empty)

  /** Distinct partition tuples above which [[plan]] abandons the
    * union-of-typed-scans shape for one flat hive-discovery scan
    * (when the layout provably supports it). */
  private def unionPartitionLimit(spark: SparkSession): Int =
    spark.conf.get("spark.graft.delta.unionPartitionLimit", "256").toInt

  /** Read the latest snapshot of the Delta table at `root`. */
  def read(spark: SparkSession, root: String): DataFrame =
    read(spark, root, Int.MaxValue)

  /** Time travel: the table exactly as of log version `versionAsOf`
    * (inclusive). Fails if no commits ≤ that version exist, and
    * refuses BY NAME when the version's files were reclaimed by
    * [[DeltaWrite.vacuum]] — a historical manifest referencing
    * deleted bytes must not surface as a lazy scan-time
    * FileNotFound (r15). The probe is manifest-scale (one stat per
    * live file) and only paid on actual time travel, never on a
    * latest-snapshot read. */
  def read(spark: SparkSession, root: String, versionAsOf: Int): DataFrame = {
    val st = state(spark, root, versionAsOf)
    if (versionAsOf != Int.MaxValue && st.version < latestVersion(root))
      probeVacuumed(root, st)
    plan(spark, root, st.meta, st.live, st.dvs)
  }

  /** TIMESTAMP time travel (VERDICT r14 gap 6): the table as of the
    * last commit whose timestamp is ≤ `timestampMs`. Commit
    * timestamps come from `commitInfo.inCommitTimestamp` when the
    * writer recorded one (the inCommitTimestamps feature's field),
    * else the commit file's modification time — the protocol's
    * definition — adjusted to be strictly monotonic the way the
    * ecosystem does (a clock-skewed commit inherits predecessor+1, so
    * resolution is always well-ordered). Boundary: a timestamp equal
    * to a commit's resolves TO that commit (inclusive); one before
    * the earliest SURVIVING commit refuses by name (earlier commits
    * may have been [[DeltaWrite.cleanLog]]ed — their timestamps are
    * unknowable, so guessing would silently misresolve). */
  def readAsOf(spark: SparkSession, root: String,
               timestampMs: Long): DataFrame =
    read(spark, root, versionAsOf(root, timestampMs).toInt)

  /** The version [[readAsOf]] resolves `timestampMs` to. */
  def versionAsOf(root: String, timestampMs: Long): Long = {
    val ts = commitTimestamps(root)
    require(ts.nonEmpty, s"no surviving commits at $root")
    require(timestampMs >= ts.head._2,
      s"timestamp $timestampMs precedes the earliest surviving commit " +
        s"(version ${ts.head._1} at ${ts.head._2}) at $root — older " +
        "commits' timestamps are gone (log-cleaned); pass a timestamp " +
        "at or after the earliest surviving commit")
    ts.takeWhile(_._2 <= timestampMs).last._1
  }

  /** CHANGE FEED by timestamp: the row-level changes committed AFTER
    * `fromTimestampMs` and at-or-before `toTimestampMs` — i.e.
    * versions in `(versionAsOf(from), versionAsOf(to)]`, with a
    * `fromTimestampMs` before the earliest surviving commit meaning
    * "from the beginning". Symmetric as-of resolution at both ends
    * keeps the boundary rule identical to [[readAsOf]]'s: a timestamp
    * equal to a commit's timestamp puts that commit on the FROM side
    * (its changes excluded) or the TO side (included). */
  def readChangesAsOf(spark: SparkSession, root: String,
                      fromTimestampMs: Long, toTimestampMs: Long): DataFrame = {
    require(fromTimestampMs <= toTimestampMs,
      s"readChangesAsOf range [$fromTimestampMs, $toTimestampMs] is empty")
    val ts = commitTimestamps(root)
    require(ts.nonEmpty, s"no surviving commits at $root")
    val fromV =
      if (fromTimestampMs < ts.head._2) ts.head._1 - 1
      else ts.takeWhile(_._2 <= fromTimestampMs).last._1
    // a window ending before the earliest surviving commit is
    // legitimately EMPTY (review r15: versionAsOf's too-early refusal
    // is for point reads — here nothing was log-cleaned away, there
    // is simply no commit inside the window)
    val toV =
      if (toTimestampMs < ts.head._2) fromV
      else ts.takeWhile(_._2 <= toTimestampMs).last._1
    if (toV <= fromV) {
      // no commit inside the window — an empty frame under the
      // table's change schema
      val schema = state(spark, root, Long.MaxValue).meta.schema
      val outSchema = StructType(schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    } else readChanges(spark, root, fromV + 1, toV)
  }

  /** (version, adjusted timestamp) for every SURVIVING commit JSON,
    * ascending; `inCommitTimestamp` wins over mtime; monotonicity
    * enforced as max(raw, previous + 1). Manifest-scale: one first-
    * line parse + one stat per commit. */
  private def commitTimestamps(root: String): Vector[(Long, Long)] = {
    val log = Paths.get(root, "_delta_log")
    require(Files.isDirectory(log), s"not a Delta table: no _delta_log under $root")
    val commits = {
      val ls = Files.list(log)
      try ls.iterator.asScala.map(_.getFileName.toString)
        .collect { case n if n.matches("\\d{20}\\.json") => n.take(20).toLong }
        .toVector.sorted
      finally ls.close()
    }
    var prev = Long.MinValue
    commits.map { v =>
      val p = log.resolve(f"$v%020d.json")
      // lazy line stream + substring screen: only lines that can
      // carry the field are JSON-parsed, and a large commit's action
      // tail is never materialized (review r15)
      val ict = {
        val s = Files.lines(p, StandardCharsets.UTF_8)
        try s.iterator().asScala
          .filter(_.contains("\"inCommitTimestamp\""))
          .flatMap(l =>
            Json.long(Json.parse(l), "commitInfo", "inCommitTimestamp"))
          .nextOption()
        finally s.close()
      }
      val raw = ict.getOrElse(Files.getLastModifiedTime(p).toMillis)
      val adj = if (prev == Long.MinValue) raw else math.max(raw, prev + 1)
      prev = adj
      (v, adj)
    }
  }

  /** Refuse a historical state whose data or deletion-vector files no
    * longer exist — vacuumed past the retention horizon. */
  private def probeVacuumed(root: String, st: TableState): Unit = {
    val missing = st.live.map(f => resolvePath(root, f._1))
      .filterNot(p => Files.exists(Paths.get(p)))
    require(missing.isEmpty,
      s"version ${st.version} at $root references ${missing.size} data " +
        s"file(s) removed by VACUUM (e.g. ${missing.head}) — time travel " +
        "past the retention horizon is gone; read a surviving version")
    val missingDv = st.dvs.values
      .filter(d => d.storageType == "u" || d.storageType == "p")
      .map(d => DeltaDv.dvPath(root, d)).filterNot(Files.exists(_)).toSeq
    require(missingDv.isEmpty,
      s"version ${st.version} at $root references ${missingDv.size} " +
        s"deletion-vector file(s) removed by VACUUM (e.g. ${missingDv.head})" +
        " — time travel past the retention horizon is gone; read a " +
        "surviving version")
  }

  /** Latest-snapshot read with FILE SKIPPING on a closed interval —
    * the protocol's reason `add.stats` exists: live files whose
    * minValues/maxValues PROVE no row can satisfy
    * `lo <= column <= hi` are dropped before any scan is planned, so
    * a point/range lookup on a clustered table touches only the
    * overlapping files' footers, never the table. Missing or partial
    * stats keep the file (skipping must be sound, not complete), and
    * the predicate is still applied to the surviving rows — stats can
    * only reduce I/O, never change the answer. Pass null for an open
    * bound. */
  def readBetween(spark: SparkSession, root: String, column: String,
                  lo: Any, hi: Any): DataFrame = {
    val st = state(spark, root, Long.MaxValue)
    val kept = pruneLive(st, column, lo, hi)
    val df = plan(spark, root, st.meta, kept, st.dvs)
    val c = col(s"`$column`")
    df.where(
      (if (lo == null) lit(true) else c >= lit(lo)) &&
        (if (hi == null) lit(true) else c <= lit(hi)))
  }

  /** CHANGE DATA FEED read: the row-level changes each version in
    * `[fromVersion, toVersion]` committed, as one frame of the table's
    * columns plus `_change_type` (insert / delete / update_preimage /
    * update_postimage) and `_commit_version` — the surface CDF
    * consumers (downstream syncs, audit pipelines, incremental
    * materializations) build on.
    *
    * Per version, exactly the protocol's reader rule:
    *   - a commit carrying `cdc` actions is read from its change-data
    *     files ONLY (they are authoritative; the commit's add/remove
    *     actions are ignored for change purposes — PROTOCOL.md "Change
    *     Data Files"). The files carry `_change_type` themselves and
    *     their partition values inject from the action like adds'.
    *   - otherwise changes derive from the commit's dataChange file
    *     actions as a MULTISET diff: removed logical files' rows read
    *     under the PRE-commit state (their old deletion vectors),
    *     added ones under the post-commit state, then
    *     deletes = removed \ added and inserts = added \ removed
    *     (`exceptAll`). This attributes every commit shape this
    *     writer emits exactly — appends (all adds insert), full-file
    *     deletes, copy-on-write rewrites (surviving rows cancel OUT —
    *     they are not changes), overwrites, and deletion-vector
    *     updates (remove(f, oldDv) + add(f, newDv): the diff is
    *     precisely the newly hidden rows).
    *   - dataChange=false commits ([[DeltaWrite.purgeVectors]],
    *     OPTIMIZE) contribute NOTHING — the CDC contract.
    *
    * Refusals: a vacuumed commit file in range (per-version actions
    * are gone — no change attribution), and a schema change inside
    * the range (the union would silently mis-bind columns).
    *
    * 100 TB shape: per version the work is one scan of the COMMIT's
    * files plus an exceptAll shuffle of those rows — commit-
    * proportional, never table-proportional; the log folds are
    * manifest-scale. */
  def readChanges(spark: SparkSession, root: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    val last = latestVersion(root)
    val to = math.min(toVersion, last)
    require(fromVersion >= 0 && fromVersion <= to,
      s"readChanges range [$fromVersion, $toVersion] is empty for table " +
        s"at $root (latest version $last)")
    val logDir = Paths.get(root, "_delta_log")
    (fromVersion to to).foreach { v =>
      require(Files.isRegularFile(logDir.resolve(f"$v%020d.json")),
        s"commit $v at $root was vacuumed — its per-version actions are " +
          "gone, so row-level changes cannot be attributed; narrow the " +
          "range to surviving commits")
    }
    // one fold per DISTINCT version across the whole range (ADVICE
    // r14: the metas loop + changesAt's state(v)/state(v-1) re-folded
    // the full log O(range²) times — each fold replays checkpoint
    // parquet plus the JSON tail, expensive on long ranges for purely
    // derivable per-version state)
    val stCache = scala.collection.mutable.HashMap.empty[Long, TableState]
    def stateAt(v: Long): TableState =
      stCache.getOrElseUpdate(v, state(spark, root, v))
    val metas = (fromVersion to to).map(v => v -> stateAt(v).meta)
    metas.sliding(2).foreach {
      case Seq((v1, m1), (v2, m2)) =>
        require(m1.schema == m2.schema && m1.partitionCols == m2.partitionCols,
          s"table schema changes between versions $v1 and $v2 at $root — " +
            "a single change feed cannot span a schema change; split the range")
      case _ => ()
    }
    val schema = metas.head._2.schema
    val frames = (fromVersion to to).flatMap(v =>
      changesAt(spark, root, v, stateAt))
    if (frames.isEmpty) {
      val outSchema = StructType(schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    } else frames.reduce(_ unionByName _)
  }

  /** One version's change frame (None when the commit changed no
    * rows). `stateAt` memoizes the log folds across the caller's
    * range. */
  private def changesAt(spark: SparkSession, root: String, v: Long,
                        stateAt: Long => TableState): Option[DataFrame] = {
    val log = Paths.get(root, "_delta_log")
    val commitFile = log.resolve(f"$v%020d.json")
    require(Files.isRegularFile(commitFile),
      s"commit $v at $root was vacuumed — its per-version actions are " +
        "gone, so row-level changes cannot be attributed; narrow the range " +
        "to surviving commits")
    val st = stateAt(v)
    var cdcs = Vector.empty[(String, Map[String, String])]
    var adds = Vector.empty[String]
    var removes = Vector.empty[String]
    Files.readAllLines(commitFile, StandardCharsets.UTF_8)
      .asScala.filter(_.trim.nonEmpty).foreach { line =>
        val obj = Json.parse(line).asInstanceOf[Map[String, Any]]
        obj.get("cdc").foreach { c =>
          cdcs :+= ((Json.str(c, "path")
            .getOrElse(sys.error(s"cdc without path: $line")),
            strMap(Json.get(c, "partitionValues"))))
        }
        obj.get("add").foreach { a =>
          if (Json.get(a, "dataChange") != java.lang.Boolean.FALSE)
            adds :+= Json.str(a, "path")
              .getOrElse(sys.error(s"add without path: $line"))
        }
        obj.get("remove").foreach { r =>
          if (Json.get(r, "dataChange") != java.lang.Boolean.FALSE)
            removes ++= Json.str(r, "path")
        }
      }

    val verCol = lit(v).as("_commit_version")
    if (cdcs.nonEmpty) {
      // change-data files are authoritative; they carry _change_type
      // as a physical column and live under the table root like data.
      // Under column mapping (EITHER mode — id-mode files carry
      // physical names too, the spec requires physicalName metadata in
      // both) the files' data columns are the PHYSICAL col-<uuid>
      // names and the log keys partitionValues physically (ADVICE r14:
      // reading under the logical schema here bound every column to
      // NULL silently); `_change_type` itself is never mapped.
      val cmMode =
        st.meta.configuration.getOrElse("delta.columnMapping.mode", "none")
      val mapped = cmMode == "name" || cmMode == "id"
      val dataCols = st.meta.schema.fields
        .filterNot(f => st.meta.partitionCols.contains(f.name))
      val readFields =
        if (!mapped) dataCols
        else dataCols.map(f => org.apache.spark.sql.types.StructField(
          physicalName(f), toPhysical(f.dataType, withIds = false),
          f.nullable))
      val readSchema = StructType(readFields :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType))
      val physByLogical =
        st.meta.schema.fields.map(f => f.name -> physicalName(f)).toMap
      val frames = cdcs.map { case (p, pv) =>
        val abs = resolvePath(root, p)
        require(Files.exists(Paths.get(abs)),
          s"change-data file $p for commit $v at $root was removed by " +
            "VACUUM — its row-level changes are gone; narrow the range " +
            "to commits inside the retention window")
        val base = spark.read.schema(readSchema).parquet(abs)
        val logical =
          if (!mapped) base
          else base.select(dataCols.map(f =>
            col(s"`${physicalName(f)}`").cast(f.dataType).as(f.name))
            .toIndexedSeq :+ col("_change_type"): _*)
        val withParts = st.meta.partitionCols.foldLeft(logical) { (df, pc) =>
          val f = st.meta.schema.fields.find(_.name == pc)
            .getOrElse(sys.error(s"partition column $pc missing from schema"))
          val raw =
            if (!mapped) pv.get(pc).orNull
            else pv.get(physByLogical(pc)).orElse(pv.get(pc)).orNull
          df.withColumn(pc,
            (if (raw == null) lit(null) else lit(raw)).cast(f.dataType))
        }
        withParts.select((st.meta.schema.fieldNames.map(col) ++
          Seq(col("_change_type"), verCol)).toIndexedSeq: _*)
      }
      Some(frames.reduce(_ unionByName _))
    } else if (adds.isEmpty && removes.isEmpty) None
    else {
      // the v-1 fold is only needed (and only well-defined — v-1 may
      // predate the oldest usable checkpoint) when the commit REMOVES
      // logical files
      val prev =
        if (v == 0 || removes.isEmpty) None
        else Some(stateAt(v - 1))
      // removed logical files read under their PRE-commit visibility;
      // added ones under the post-commit state
      val addedEntries = st.live.filter(f => adds.contains(f._1))
      val removedEntries = prev.map(_.live.filter(f => removes.contains(f._1)))
        .getOrElse(Seq.empty)
      // both sides' bytes must still exist — a vacuumed historical
      // file refuses by name, never a lazy scan-time FileNotFound
      (addedEntries ++ removedEntries).foreach { case (p, _) =>
        require(Files.exists(Paths.get(resolvePath(root, p))),
          s"data file $p referenced by commit $v at $root was removed by " +
            "VACUUM — its row-level changes cannot be derived; narrow the " +
            "range to commits inside the retention window")
      }
      val addedRows = plan(spark, root, st.meta, addedEntries, st.dvs)
      val removedRows = prev match {
        case Some(p) => plan(spark, root, p.meta, removedEntries, p.dvs)
        case None => addedRows.limit(0)
      }
      val ins = addedRows.exceptAll(removedRows)
        .select((st.meta.schema.fieldNames.map(col) :+
          lit("insert").as("_change_type") :+ verCol).toIndexedSeq: _*)
      val del = removedRows.exceptAll(addedRows)
        .select((st.meta.schema.fieldNames.map(col) :+
          lit("delete").as("_change_type") :+ verCol).toIndexedSeq: _*)
      Some(ins.unionByName(del))
    }
  }

  /** The live files a stats-aware reader must scan for
    * `lo <= column <= hi`: drops a file iff its stats PROVE
    * max < lo or min > hi. Numbers compare numerically (parse emits
    * Long or Double), strings lexically — matching the unsigned-UTF-8
    * order [[DeltaWrite]] writes (exact for the code-point range
    * these engines exchange). */
  private[sources] def pruneLive(st: TableState, column: String,
                                 lo: Any, hi: Any)
      : Seq[(String, Map[String, String])] = {
    def num(v: Any): Option[Double] = v match {
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
      case d: Double => Some(d)
      case _ => None
    }
    // provable only when both sides share a comparison domain
    def lt(a: Any, b: Any): Option[Boolean] = (num(a), num(b)) match {
      case (Some(x), Some(y)) => Some(x < y)
      case _ => (a, b) match {
        case (s1: String, s2: String) => Some(s1 < s2)
        case _ => None
      }
    }
    // under column mapping the spec keys stats PHYSICALLY — resolve
    // the logical column through the schema, falling back to the
    // logical key for lenient writers (a miss keeps the file: sound)
    val statsKeys: Seq[String] = {
      val cm = st.meta.configuration
        .getOrElse("delta.columnMapping.mode", "none")
      if (cm == "none") Seq(column)
      else st.meta.schema.fields.find(_.name == column)
        .map(f => Seq(physicalName(f), column)).getOrElse(Seq(column))
    }
    def statVal(s: Any, side: String): Option[Any] =
      statsKeys.iterator.map(k => Option(Json.get(s, side, k)))
        .collectFirst { case Some(v) => v }
    st.live.filter { case (p, _) =>
      st.stats.get(p) match {
        case None => true
        case Some(json) =>
          val s = Json.parse(json)
          val mn = statVal(s, "minValues")
          val mx = statVal(s, "maxValues")
          val belowLo = // max < lo → no row can reach the interval
            (for (m <- mx; l <- Option(lo); r <- lt(m, l)) yield r)
              .getOrElse(false)
          val aboveHi = // min > hi
            (for (m <- mn; h <- Option(hi); r <- lt(h, m)) yield r)
              .getOrElse(false)
          !belowLo && !aboveHi
      }
    }
  }

  /** The three checkpoint forms the protocol defines — all readable
    * here: classic single-part (`<v>.checkpoint.parquet`), classic
    * multi-part (`<v>.checkpoint.<i>.<n>.parquet`, usable only when
    * all `n` parts survive), and V2 (`<v>.checkpoint.<uuid>.parquet`
    * or `.json` — a manifest whose file actions may live in sidecar
    * parquet files under `_delta_log/_sidecars/`). */
  private sealed trait Checkpoint { def version: Long }
  private case class CpSingle(version: Long, name: String) extends Checkpoint
  private case class CpMulti(version: Long, parts: Seq[String]) extends Checkpoint
  private case class CpV2(version: Long, name: String) extends Checkpoint

  /** Highest version present in the log (commit or checkpoint). */
  def latestVersion(root: String): Long = {
    val (commits, checkpoints, _) = logEntries(root, Long.MaxValue)
    (commits.map(_._1) ++ checkpoints.map(_.version)).foldLeft(-1L)(math.max)
  }

  /** List the log: (commits, USABLE checkpoints ascending — at one
    * version the cheapest form sorts last, so `.lastOption` picks
    * single > v2 > multi — and unusable checkpoint versions with the
    * reason, for refusal messages), each capped at `versionAsOf`. */
  private def logEntries(root: String, versionAsOf: Long)
      : (Vector[(Long, String)], Vector[Checkpoint], Vector[(Long, String)]) = {
    val log = Paths.get(root, "_delta_log")
    require(Files.isDirectory(log), s"not a Delta table: no _delta_log under $root")
    val names = {
      val ls = Files.list(log)
      try ls.iterator.asScala.map(_.getFileName.toString).toVector
      finally ls.close()
    }
    val commits = names
      .collect { case n if n.matches("\\d{20}\\.json") => (n.take(20).toLong, n) }
      .filter(_._1 <= versionAsOf).sortBy(_._1)
    val singles = names
      .collect { case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
        CpSingle(n.take(20).toLong, n) }
    val MultiRe = """(\d{20})\.checkpoint\.(\d+)\.(\d+)\.parquet""".r
    val multiParts = names.collect {
      case n @ MultiRe(v, i, total) => (v.toLong, i.toLong, total.toLong, n)
    }
    val (multis, broken) = multiParts.groupBy(_._1).toVector.map {
      case (v, parts) =>
        val totals = parts.map(_._3).distinct
        val have = parts.map(_._2).toSet
        if (totals.size == 1 && have == (1L to totals.head).toSet)
          Left(CpMulti(v, parts.sortBy(_._2).map(_._4)))
        else
          Right((v, s"multi-part checkpoint at version $v is incomplete " +
            s"(${have.size} of ${totals.max} parts survive)"))
    }.partitionMap(identity)
    val v2s = names
      .collect {
        case n if n.matches(
            "\\d{20}\\.checkpoint\\.[0-9a-fA-F-]{36}\\.(parquet|json)") =>
          CpV2(n.take(20).toLong, n)
      }
    val rank: Checkpoint => Int = {
      case _: CpMulti => 0
      case _: CpV2 => 1
      case _: CpSingle => 2
    }
    val usable = (singles ++ multis ++ v2s)
      .filter(_.version <= versionAsOf)
      .sortBy(cp => (cp.version, rank(cp)))
    (commits, usable, broken.filter(_._1 <= versionAsOf).sortBy(_._1))
  }

  /** Fold the log to the table state at `versionAsOf` — checkpoint
    * bootstrap, then JSON commits in version order; last action per
    * path wins; newest metaData wins. All protocol refusals live
    * here so every caller (snapshot read, flat-plan read, CDC sync)
    * gets the same guarantees.
    *
    * Visibility: `private[graft]` so the write-path specs can assert
    * the folded protocol/feature/vector state directly (the
    * [[GraftTable.commit]] precedent). */
  private[graft] def state(spark: SparkSession, root: String,
                           versionAsOf: Long): TableState = {
    val log = Paths.get(root, "_delta_log")
    val (commits, checkpoints, brokenCps) = logEntries(root, versionAsOf)
    require(commits.nonEmpty || checkpoints.nonEmpty,
      s"no Delta commits at or below version $versionAsOf under $root")

    var meta: Option[Meta] = None
    var minReader = 1L
    var minWriter = 1L
    var readerFeatures = Set.empty[String]
    var writerFeatures = Set.empty[String]
    // LOGICAL file = (path, deletionVector uniqueId) — the spec's
    // reconciliation key since reader version 3: updating a file's DV
    // is remove(path, oldDv) + add(path, newDv) in one commit, and the
    // two must not collide in the fold. DV-less actions key as "".
    // value = (partitionValues, live?, deletionVector)
    val files = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (Map[String, String], Boolean, Option[DeltaDv.DvDescriptor])]
    val stats = scala.collection.mutable.HashMap.empty[String, String]
    val txns = scala.collection.mutable.HashMap.empty[String, Long]

    def applyAdd(path: String, pv: Map[String, String],
                 st: Option[String], dv: Option[DeltaDv.DvDescriptor]): Unit = {
      files.update((path, dv.map(_.uniqueId).getOrElse("")), (pv, true, dv))
      st match {
        case Some(s) => stats.update(path, s)
        case None => stats.remove(path) // re-add without stats supersedes
      }
    }
    def applyRemove(path: String, dvId: String): Unit =
      files.updateWith((path, dvId)) {
        case Some((pv, _, dv)) => Some((pv, false, dv))
        case None => Some((Map.empty, false, None))
      }

    // checkpoint = the folded state at that version, as parquet rows
    // with one non-null action struct each — Spark's parquet reader IS
    // the checkpoint reader. Also applied to v2-checkpoint SIDECAR
    // files, which carry the same add/remove schema.
    def foldCheckpoint(cp: DataFrame): Unit = {
      val cols = cp.columns.toSet
      def sub(struct: String, field: String): Boolean =
        cp.schema(struct).dataType.asInstanceOf[StructType]
          .fieldNames.contains(field)
      def dvField(field: String, t: String) = {
        val has = sub("add", "deletionVector") && cp.schema("add").dataType
          .asInstanceOf[StructType]("deletionVector").dataType
          .asInstanceOf[StructType].fieldNames.contains(field)
        if (has) col(s"add.deletionVector.$field").cast(t)
        else lit(null).cast(t)
      }
      if (cols("metaData")) {
        val hasConf = sub("metaData", "configuration")
        cp.where(col("metaData.schemaString").isNotNull)
          .select(col("metaData.schemaString"),
            col("metaData.partitionColumns"),
            if (hasConf) col("metaData.configuration")
            else lit(null).cast("map<string,string>"),
            if (sub("metaData", "id")) col("metaData.id")
            else lit(null).cast("string"),
            if (sub("metaData", "createdTime")) col("metaData.createdTime")
            else lit(null).cast("long"))
          .collect().lastOption.foreach { r =>
            meta = Some(Meta(
              DataType.fromJson(r.getString(0)).asInstanceOf[StructType],
              Option(r.getSeq[String](1)).getOrElse(Seq.empty),
              Option(r.getMap[String, String](2)).map(_.toMap)
                .getOrElse(Map.empty),
              Option(r.getString(3)).getOrElse(""),
              if (r.isNullAt(4)) None else Some(r.getLong(4))))
          }
      }
      if (cols("protocol")) {
        val hasW = sub("protocol", "minWriterVersion")
        cp.where(col("protocol.minReaderVersion").isNotNull)
          .select(col("protocol.minReaderVersion").cast("long"),
            if (hasW) col("protocol.minWriterVersion").cast("long")
            else lit(1L),
            if (sub("protocol", "readerFeatures")) col("protocol.readerFeatures")
            else lit(null).cast("array<string>"),
            if (sub("protocol", "writerFeatures")) col("protocol.writerFeatures")
            else lit(null).cast("array<string>"))
          .collect().foreach { r =>
            // the newest protocol action REPLACES the protocol (spec:
            // exactly one protocol per checkpoint; commits below
            // assign for the same reason)
            minReader = r.getLong(0)
            minWriter = r.getLong(1)
            readerFeatures =
              if (r.isNullAt(2)) Set.empty else r.getSeq[String](2).toSet
            writerFeatures =
              if (r.isNullAt(3)) Set.empty else r.getSeq[String](3).toSet
          }
      }
      if (cols("add"))
        cp.where(col("add.path").isNotNull)
          .select(col("add.path"), col("add.partitionValues"),
            if (sub("add", "stats")) col("add.stats")
            else lit(null).cast("string"),
            dvField("storageType", "string"),
            dvField("pathOrInlineDv", "string"),
            dvField("offset", "long"),
            dvField("sizeInBytes", "long"),
            dvField("cardinality", "long"))
          .collect().foreach { r =>
            val dv =
              if (r.isNullAt(3)) None
              else Some(DeltaDv.DvDescriptor(r.getString(3), r.getString(4),
                if (r.isNullAt(5)) None else Some(r.getLong(5)),
                r.getLong(6).toInt, r.getLong(7)))
            applyAdd(r.getString(0),
              Option(r.getMap[String, String](1)).map(_.toMap)
                .getOrElse(Map.empty),
              Option(r.getString(2)), dv)
          }
      if (cols("txn"))
        cp.where(col("txn.appId").isNotNull)
          .select(col("txn.appId"), col("txn.version").cast("long"))
          .collect().foreach(r => txns.update(r.getString(0), r.getLong(1)))
    }

    // V2-checkpoint manifests in JSON form carry the same actions as
    // commit lines (plus checkpointMetadata/sidecar); in a CHECKPOINT
    // context remove actions are expired tombstones, never state.
    // Returns the sidecar paths the manifest references.
    def foldJsonManifest(name: String): (Seq[String], Option[Long]) = {
      val sidecars = Vector.newBuilder[String]
      var cpMeta: Option[Long] = None
      Files.readAllLines(log.resolve(name), StandardCharsets.UTF_8)
        .asScala.filter(_.trim.nonEmpty).foreach { line =>
          val obj = Json.parse(line) match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            case other => sys.error(s"checkpoint manifest line is not an object: $other")
          }
          obj.get("metaData").foreach { m =>
            meta = Some(Meta(
              DataType.fromJson(Json.str(m, "schemaString")
                  .getOrElse(sys.error(s"metaData without schemaString: $line")))
                .asInstanceOf[StructType],
              Json.list(m, "partitionColumns").map(_.asInstanceOf[String]),
              strMap(Json.get(m, "configuration")),
              Json.str(m, "id").getOrElse(""),
              Json.long(m, "createdTime")))
          }
          obj.get("protocol").foreach { p =>
            // newest protocol action WINS outright (spec: the action
            // replaces the table's protocol; folding max/union would
            // keep stale feature lists alive past an upgrade)
            minReader = Json.long(p, "minReaderVersion").getOrElse(1L)
            minWriter = Json.long(p, "minWriterVersion").getOrElse(1L)
            readerFeatures = Json.list(p, "readerFeatures")
              .map(_.asInstanceOf[String]).toSet
            writerFeatures = Json.list(p, "writerFeatures")
              .map(_.asInstanceOf[String]).toSet
          }
          obj.get("add").foreach { a =>
            applyAdd(Json.str(a, "path")
                .getOrElse(sys.error(s"add without path: $line")),
              strMap(Json.get(a, "partitionValues")),
              Json.str(a, "stats"),
              DeltaDv.descriptor(Json.get(a, "deletionVector")))
          }
          obj.get("txn").foreach { t =>
            for (app <- Json.str(t, "appId"); v <- Json.long(t, "version"))
              txns.update(app, v)
          }
          obj.get("sidecar").foreach { s =>
            sidecars += Json.str(s, "path")
              .getOrElse(sys.error(s"sidecar without path: $line"))
          }
          obj.get("checkpointMetadata").foreach { cm =>
            cpMeta = Json.long(cm, "version")
          }
          // remove: expired tombstone in a checkpoint — not state
        }
      (sidecars.result(), cpMeta)
    }

    /** `sidecar.path` resolves under `_delta_log/_sidecars/` unless
      * absolute (URI-encoded like add.path). */
    def sidecarPath(p: String): String = {
      val decoded = percentDecode(p)
      if (Paths.get(decoded).isAbsolute) decoded
      else log.resolve("_sidecars").resolve(decoded).toString
    }

    checkpoints.lastOption.foreach {
      case CpSingle(_, name) =>
        foldCheckpoint(spark.read.parquet(log.resolve(name).toString))
      case CpMulti(_, parts) =>
        // the parts partition one logical checkpoint's rows — reading
        // them together IS the single-part fold
        foldCheckpoint(spark.read.parquet(
          parts.map(p => log.resolve(p).toString): _*))
      case CpV2(v, name) =>
        // manifest first (protocol/metaData/txn + any inline file
        // actions + the sidecar list), then each sidecar's file actions
        val (sidecars, cpMeta) =
          if (name.endsWith(".json")) foldJsonManifest(name)
          else {
            val mf = spark.read.parquet(log.resolve(name).toString)
            foldCheckpoint(mf)
            val cols = mf.columns.toSet
            val sc =
              if (!cols("sidecar")) Seq.empty[String]
              else mf.where(col("sidecar.path").isNotNull)
                .select(col("sidecar.path"))
                .collect().map(_.getString(0)).toSeq
            val cm =
              if (!cols("checkpointMetadata")) None
              else mf.where(col("checkpointMetadata.version").isNotNull)
                .select(col("checkpointMetadata.version").cast("long"))
                .collect().headOption.map(_.getLong(0))
            (sc, cm)
          }
        // the spec makes checkpointMetadata MANDATORY in a v2
        // checkpoint, and its version must be the file's own — a
        // mismatch means a mis-renamed or forged manifest
        require(cpMeta.contains(v),
          s"v2 checkpoint $name at $root carries checkpointMetadata " +
            s"version ${cpMeta.fold("<none>")(_.toString)}, expected $v — " +
            "refusing a manifest that does not claim its own version")
        sidecars.foreach { sp =>
          foldCheckpoint(spark.read.parquet(sidecarPath(sp)))
        }
    }

    val cpVersion = checkpoints.lastOption.map(_.version).getOrElse(-1L)
    val tail = commits.filter(_._1 > cpVersion)
    // Contiguity (ADVICE r12): the fold is only sound if every commit
    // after the bootstrap checkpoint survives. A gap means the log was
    // cleaned past a checkpoint this reader cannot use — with every
    // checkpoint FORM readable now, that is an INCOMPLETE multi-part
    // checkpoint (named below) or genuine log corruption.
    tail.map(_._1).zipWithIndex.foreach { case (v, i) =>
      val expect = cpVersion + 1 + i
      require(v == expect,
        s"Delta log at $root has a gap: expected commit version $expect " +
          s"after ${if (cpVersion < 0) "no usable checkpoint" else s"checkpoint $cpVersion"}, " +
          s"found $v" +
          (if (brokenCps.nonEmpty)
            s"; unusable checkpoint(s): ${brokenCps.map(_._2).mkString("; ")} " +
              "— refusing rather than reconstructing an incomplete state"
          else ""))
    }

    tail.foreach { case (_, name) =>
      Files.readAllLines(log.resolve(name), StandardCharsets.UTF_8)
        .asScala.filter(_.trim.nonEmpty).foreach { line =>
          // one action object per line: {"add": {...}} etc. — parsed
          // in full, so nesting/escaping/field order can't confuse it
          val obj = Json.parse(line) match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            case other => sys.error(s"Delta log line is not an object: $other")
          }
          obj.get("metaData").foreach { m =>
            meta = Some(Meta(
              DataType.fromJson(Json.str(m, "schemaString")
                  .getOrElse(sys.error(s"metaData without schemaString: $line")))
                .asInstanceOf[StructType],
              Json.list(m, "partitionColumns").map(_.asInstanceOf[String]),
              strMap(Json.get(m, "configuration")),
              Json.str(m, "id").getOrElse(""),
              Json.long(m, "createdTime")))
          }
          obj.get("protocol").foreach { p =>
            // newest protocol action WINS outright (spec: the action
            // replaces the table's protocol; folding max/union would
            // keep stale feature lists alive past an upgrade)
            minReader = Json.long(p, "minReaderVersion").getOrElse(1L)
            minWriter = Json.long(p, "minWriterVersion").getOrElse(1L)
            readerFeatures = Json.list(p, "readerFeatures")
              .map(_.asInstanceOf[String]).toSet
            writerFeatures = Json.list(p, "writerFeatures")
              .map(_.asInstanceOf[String]).toSet
          }
          obj.get("add").foreach { a =>
            applyAdd(Json.str(a, "path")
                .getOrElse(sys.error(s"add without path: $line")),
              strMap(Json.get(a, "partitionValues")),
              Json.str(a, "stats"),
              DeltaDv.descriptor(Json.get(a, "deletionVector")))
          }
          obj.get("remove").foreach { r =>
            Json.str(r, "path").foreach { p =>
              applyRemove(p, DeltaDv.descriptor(Json.get(r, "deletionVector"))
                .map(_.uniqueId).getOrElse(""))
            }
          }
          obj.get("txn").foreach { t =>
            // SetTransaction: latest entry per appId wins (the spec's
            // fold rule) — the streaming writer's idempotence ledger
            for (app <- Json.str(t, "appId"); v <- Json.long(t, "version"))
              txns.update(app, v)
          }
          // commitInfo / cdc — irrelevant to reads
        }
    }

    require(minReader <= 3,
      s"Delta table at $root needs minReaderVersion=$minReader; this " +
        "reader implements protocol <= 3 and refuses rather than mis-reads")
    // Reader version 3 = table features: the protocol action MUST list
    // readerFeatures and a reader may proceed only if it implements
    // every listed one (PROTOCOL.md "Table Features"). Refusing an
    // UNKNOWN feature is the whole safety model — e.g. a reader that
    // ignored deletionVectors would resurrect deleted rows.
    if (minReader >= 3) {
      require(readerFeatures.nonEmpty,
        s"Delta table at $root declares minReaderVersion=$minReader but " +
          "lists no readerFeatures — the spec requires every version-3 " +
          "protocol action to carry them; refusing a non-conformant table")
      val unsupported = readerFeatures -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"Delta table at $root requires reader feature(s) " +
          s"${unsupported.toSeq.sorted.mkString(", ")} this reader does not " +
          s"implement (supported: ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}) " +
          "— refusing rather than mis-reading")
    }
    val m = meta.getOrElse(sys.error(s"no metaData action found in $root"))
    // Column mapping is THE minReaderVersion=2 feature (PROTOCOL.md).
    // `name` mode is READ via the physical names in the schema
    // metadata this fold already parsed; `id` mode is READ via parquet
    // footer field-id resolution (the machinery proven on Iceberg —
    // r14): each field's delta.columnMapping.id rides the read schema
    // as parquet.field.id and the scan runs under Spark's native
    // field-id matching. Unknown modes refuse.
    val cmMode = m.configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name" || cmMode == "id",
      s"Delta table at $root uses delta.columnMapping.mode=$cmMode; this " +
        "reader implements modes none, name, and id — refusing an unknown " +
        "mode rather than guessing its resolution rule")
    if (cmMode != "none")
      m.schema.fields.foreach { f =>
        require(f.metadata.contains(PhysicalNameKey),
          s"column-mapped Delta table at $root: field ${f.name} carries no " +
            s"$PhysicalNameKey metadata — partition values and physical " +
            "columns cannot be resolved; refusing rather than returning NULLs")
        require(cmMode == "name" || f.metadata.contains(FieldIdKey),
          s"id-mapped Delta table at $root: field ${f.name} carries no " +
            s"$FieldIdKey metadata — footer field-id resolution is " +
            "impossible; refusing rather than returning NULLs")
      }

    val folded = (commits.map(_._1) :+ cpVersion).max
    val liveFull = files.collect {
      case ((p, _), (pv, true, dv)) => (p, pv, dv)
    }.toSeq
    // Reconciliation sanity: a conformant writer that re-adds a path
    // with a new DV removes the old (path, dv) in the SAME commit, so
    // at most one live entry per path can survive the fold. Two would
    // mean the same physical rows are scanned twice — refuse.
    val dup = liveFull.groupBy(_._1).collectFirst {
      case (p, es) if es.size > 1 => p
    }
    require(dup.isEmpty,
      s"Delta log at $root reconciles to multiple live entries for " +
        s"path ${dup.getOrElse("")} (deletion-vector update without the " +
        "matching remove) — a non-conformant writer; refusing rather than " +
        "double-reading the file")
    val liveSeq = liveFull.map { case (p, pv, _) => (p, pv) }
    val livePaths = liveFull.map(_._1).toSet
    val dvMap = liveFull.collect { case (p, _, Some(dv)) => p -> dv }.toMap
    TableState(folded, m, liveSeq, minWriter, minReader, txns.toMap,
      stats.toMap.view.filterKeys(livePaths).toMap, dvMap,
      readerFeatures, writerFeatures)
  }

  /** String→String JSON map (partitionValues / configuration); JSON
    * nulls preserved as nulls. */
  private def strMap(v: Any): Map[String, String] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
      case (k, null) => k -> null
      case (k, s: String) => k -> s
      case (k, other) => k -> other.toString
    }
    case _ => Map.empty
  }

  /** Pure RFC-3986 percent-decoder for `add.path`: %XX byte runs
    * decode as UTF-8, every other char — crucially '+' — stays
    * LITERAL. `URLDecoder` is FORM decoding ('+'→space): an add.path
    * containing a literal '+' (legal, and exactly what
    * [[DeltaWrite.encodePath]]'s URI encoder emits for a '+' in a
    * partition value) would resolve to a nonexistent path, making the
    * table unreadable (ADVICE r13). */
  private[sources] def percentDecode(s: String): String = {
    if (!s.contains('%')) return s
    def hex(c: Char) = (c >= '0' && c <= '9') ||
      (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    val sb = new StringBuilder
    val bytes = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (bytes.size > 0) {
      sb.append(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); sb.append(s.charAt(i)); i += 1 }
    }
    flush()
    sb.result()
  }

  private[sources] def resolvePath(root: String, p: String): String = {
    val decoded = percentDecode(p)
    if (Paths.get(decoded).isAbsolute) decoded
    else Paths.get(root).resolve(decoded).toString
  }

  /** Characters hive-style layouts store UNESCAPED in `col=value` dir
    * names — the flat-plan fallback only trusts a path⇄value match it
    * can prove without re-implementing the escaping rules. */
  private val HiveSafe = "[A-Za-z0-9_.+-]+".r

  /** True iff every live file sits at exactly
    * `<root>/p1=v1/…/pk=vk/<file>` with the log's OWN partition values
    * spelled verbatim (no escaping needed, no nulls) — the layout
    * every production Delta writer emits. Only then can Spark's
    * directory-based partition discovery be substituted for log-value
    * injection without any chance of divergence. */
  private def hiveCompatible(live: Seq[(String, Map[String, String])],
                             partitionCols: Seq[String]): Boolean =
    live.forall { case (p, pv) =>
      val decoded = percentDecode(p)
      !Paths.get(decoded).isAbsolute && {
        val vals = partitionCols.map(pv.get(_).orNull)
        vals.forall(v => v != null && HiveSafe.matches(v)) && {
          val prefix = partitionCols.zip(vals)
            .map { case (c, v) => s"$c=$v" }.mkString("", "/", "/")
          decoded.startsWith(prefix) &&
            !decoded.stripPrefix(prefix).contains('/')
        }
      }
    }

  private[sources] val PhysicalNameKey = "delta.columnMapping.physicalName"
  private[sources] val FieldIdKey = "delta.columnMapping.id"

  /** Reader features (protocol version 3) this implementation honors:
    * column mapping (both modes, r13/r14), deletion vectors
    * ([[DeltaDv]]), v2 checkpoints (manifest + sidecar bootstrap in
    * [[state]]), TIMESTAMP_NTZ columns (native to Spark's parquet
    * reader and schema JSON), and vacuumProtocolCheck (a vacuum-side
    * contract with no read-path obligation per the spec). Anything
    * else — typeWidening, variantType-as-feature, … — refuses by
    * name. */
  private val SupportedReaderFeatures: Set[String] =
    Set("columnMapping", "deletionVectors", "v2Checkpoint", "timestampNtz",
      "vacuumProtocolCheck")

  private[sources] def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Rename every struct field to its physical name, recursively —
    * the shape of the parquet files under column mapping. Under `id`
    * mode (`withIds`), the field's delta.columnMapping.id also rides
    * along as `parquet.field.id`, the key Spark's native footer
    * field-id matching resolves by. */
  private[sources] def toPhysical(t: DataType, withIds: Boolean): DataType = t match {
    case s: StructType => StructType(s.fields.map { f =>
      val md =
        if (withIds && f.metadata.contains(FieldIdKey))
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", f.metadata.getLong(FieldIdKey))
            .build()
        else org.apache.spark.sql.types.Metadata.empty
      org.apache.spark.sql.types.StructField(
        physicalName(f), toPhysical(f.dataType, withIds), f.nullable, md)
    })
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = toPhysical(a.elementType, withIds))
    case mp: org.apache.spark.sql.types.MapType =>
      mp.copy(keyType = toPhysical(mp.keyType, withIds),
        valueType = toPhysical(mp.valueType, withIds))
    case other => other
  }

  /** Derived session for `id`-mode scans — same SparkContext, own
    * SQLConf pinning parquet field-id resolution on (and id-less data
    * files to LOUD errors), exactly the [[IcebergRead]] pattern. */
  private def fieldIdSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    s.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "false")
    s.conf.set("spark.sql.session.timeZone",
      spark.conf.get("spark.sql.session.timeZone"))
    s
  }

  /** Plan a scan over `live` under `meta`. Two shapes:
    *
    *  - DEFAULT: one parquet scan per distinct partition-value tuple,
    *    the log's values injected as typed literals — value-exact for
    *    any encoding, right-sized for the common few-hundred-tuple
    *    case.
    *  - FLAT (tuple count > `spark.graft.delta.unionPartitionLimit`
    *    and the layout is provably hive-style): ONE scan with
    *    `basePath` partition discovery over the live-file list — the
    *    plan carries one scan node regardless of partition count, and
    *    partition pruning happens at planning time exactly as for a
    *    native partitioned read. Falls back to the union shape
    *    whenever the path⇄value match cannot be proven (escaped or
    *    null values, absolute paths), trading plan size for certainty.
    *
    * Under column mapping (`name` mode) the files carry PHYSICAL
    * column names: each scan reads the physical schema and a cast
    * projects back to the logical one (struct casts rename by
    * position, so nested renames come along); partition values are
    * looked up under the physical key the spec mandates (falling back
    * to the logical key for lenient writers), and the flat shape is
    * never taken — its directory names are physical and its
    * discovery-based schema would mis-bind. Because renamed/dropped
    * columns keep their physical identity, files written BEFORE a
    * rename read correctly at every version, and files missing a
    * later-added physical column return NULL for it (parquet
    * missing-column semantics), exactly as the protocol specifies. */
  /** Column names under which [[planWithMeta]] exposes each row's
    * physical provenance (the scan's `_metadata` file path and row
    * index) — what [[DeltaWrite.deleteWithDv]] aggregates into
    * deletion vectors. */
  private[sources] val MetaFileCol = "__graft_file"
  private[sources] val MetaPosCol = "__graft_pos"

  /** [[plan]] with the [[MetaFileCol]]/[[MetaPosCol]] provenance
    * columns appended (materialized in the first projection off each
    * scan, where `_metadata` is still resolvable). */
  private[sources] def planWithMeta(spark: SparkSession, root: String,
      m: Meta, live: Seq[(String, Map[String, String])],
      dvs: Map[String, DeltaDv.DvDescriptor]): DataFrame =
    plan(spark, root, m, live, dvs, withMeta = true)

  private[sources] def plan(spark: SparkSession, root: String, m: Meta,
                            live: Seq[(String, Map[String, String])],
                            dvs: Map[String, DeltaDv.DvDescriptor] = Map.empty,
                            withMeta: Boolean = false)
      : DataFrame = {
    val metaSel: Seq[org.apache.spark.sql.Column] =
      if (!withMeta) Nil
      else Seq(col("_metadata.file_path").as(MetaFileCol),
        col("_metadata.row_index").as(MetaPosCol))
    val outNames: Seq[String] =
      m.schema.fieldNames.toSeq ++
        (if (withMeta) Seq(MetaFileCol, MetaPosCol) else Nil)
    // Deletion vectors: scans over DV-carrying files keep Spark's
    // parquet metadata columns in scope and drop deleted row positions
    // via the codegen'd DvDeleted filter — applied BEFORE any
    // projection, on physical row order, exactly as the spec defines
    // row indexes. Groups without a DV'd file skip the filter
    // entirely, so a table that never deleted rows plans byte-
    // identically to before.
    val livePathSet = live.map(_._1).toSet
    lazy val dvLookup =
      DvLookup(root, dvs.view.filterKeys(livePathSet).toMap)
    def dvFilter(df: DataFrame, paths: Seq[String]): DataFrame =
      if (!paths.exists(dvs.contains)) df
      else {
        import org.apache.spark.sql.graft.Bridge
        df.where(!Bridge.column(DvDeleted(dvLookup,
          Bridge.expression(col("_metadata.file_path")),
          Bridge.expression(col("_metadata.row_index")))))
      }
    val cmMode = m.configuration.getOrElse("delta.columnMapping.mode", "none")
    val mapped = cmMode == "name" || cmMode == "id"
    val byId = cmMode == "id"
    val dataCols = m.schema.fields.filterNot(f => m.partitionCols.contains(f.name))
    val dataSchema =
      if (!mapped) StructType(dataCols)
      else StructType(dataCols.map { f =>
        val md =
          if (byId)
            new org.apache.spark.sql.types.MetadataBuilder()
              .putLong("parquet.field.id", f.metadata.getLong(FieldIdKey))
              .build()
          else org.apache.spark.sql.types.Metadata.empty
        org.apache.spark.sql.types.StructField(
          physicalName(f), toPhysical(f.dataType, byId), f.nullable, md)
      })
    val physByLogical = m.schema.fields.map(f => f.name -> physicalName(f)).toMap
    def pvOf(pv: Map[String, String], pc: String): String =
      if (!mapped) pv.get(pc).orNull
      else pv.get(physByLogical(pc)).orElse(pv.get(pc)).orNull

    if (live.isEmpty) {
      val outSchema =
        if (!withMeta) m.schema
        else StructType(m.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField(MetaFileCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(MetaPosCol,
            org.apache.spark.sql.types.LongType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    }

    val bySpec = live.groupBy(_._2).toSeq
    if (!mapped && m.partitionCols.nonEmpty &&
        bySpec.size > unionPartitionLimit(spark)
        && hiveCompatible(live, m.partitionCols)) {
      val rootAbs = Paths.get(root).toAbsolutePath.toString
      return dvFilter(spark.read
        .option("basePath", rootAbs)
        .schema(m.schema)
        .parquet(live.map(f => resolvePath(rootAbs, f._1)): _*),
        live.map(_._1))
        .select(m.schema.fieldNames.map(col).toIndexedSeq ++ metaSel: _*)
    }

    val parts = bySpec.map { case (pv, group) =>
      val reader = (if (byId) fieldIdSession(spark) else spark)
        .read.schema(dataSchema)
      val base = dvFilter(
        reader.parquet(group.map(g => resolvePath(root, g._1)): _*),
        group.map(_._1))
      val logical =
        if (!mapped && !withMeta) base
        else if (!mapped) base.select(col("*") +: metaSel: _*)
        else base.select(dataCols.map(f =>
          col(s"`${physicalName(f)}`").cast(f.dataType).as(f.name))
          .toIndexedSeq ++ metaSel: _*)
      val withParts = m.partitionCols.foldLeft(logical) { (df, pc) =>
        val f = m.schema.fields.find(_.name == pc)
          .getOrElse(sys.error(s"partition column $pc missing from schema"))
        val raw = pvOf(pv, pc)
        df.withColumn(pc,
          (if (raw == null) lit(null) else lit(raw)).cast(f.dataType))
      }
      withParts.select(outNames.map(col).toIndexedSeq: _*)
    }
    parts.reduce(_.unionAll(_))
  }
}
