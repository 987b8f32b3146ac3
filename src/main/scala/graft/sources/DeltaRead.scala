package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

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
  *
  * Reconstruction follows the spec: start from the newest checkpoint
  * at or below the requested version (if any), apply the JSON commits
  * after it in version order; a file is LIVE iff its last action is an
  * `add`; the newest `metaData` supplies schema + partition columns;
  * partition values live in the log (NOT the data files) and are
  * injected per file, cast to the declared types.
  *
  * Scope (asserted, not assumed): protocol `minReaderVersion` ≤ 2 —
  * version-3 reader features (deletion vectors, column mapping, v2
  * checkpoints) change row-level semantics and are REFUSED loudly
  * rather than mis-read silently.
  *
  * 100 TB shape: the log is manifest-scale (one action row per file —
  * the same arithmetic as [[GraftTable]]'s manifests); the driver
  * folds actions and plans one parquet scan per partition-value group,
  * while data bytes move only through executor-side parquet readers.
  * Caveat for EXTREME partition counts: a table with tens of thousands
  * of distinct partition tuples unions that many scans into one plan —
  * for those, production Delta tables are hive-laid-out
  * (`p=x/part-*.parquet`), so `spark.read.option("basePath", root)`
  * partition discovery over the live-file list is the flat-plan
  * fallback; snapshot-interop reads here target the common
  * few-hundred-partition case.
  */
object DeltaRead {

  private case class Meta(schema: StructType, partitionCols: Seq[String])

  /** Read the latest snapshot of the Delta table at `root`. */
  def read(spark: SparkSession, root: String): DataFrame =
    read(spark, root, Int.MaxValue)

  /** Time travel: the table exactly as of log version `versionAsOf`
    * (inclusive). Fails if no commits ≤ that version exist. */
  def read(spark: SparkSession, root: String, versionAsOf: Int): DataFrame = {
    val log = Paths.get(root, "_delta_log")
    require(Files.isDirectory(log), s"not a Delta table: no _delta_log under $root")

    val names = {
      val ls = Files.list(log)
      try ls.iterator.asScala.map(_.getFileName.toString).toVector
      finally ls.close()
    }
    val commits = names
      .collect { case n if n.matches("\\d{20}\\.json") =>
        (n.take(20).toLong, n) }
      .filter(_._1 <= versionAsOf).sortBy(_._1)
    val checkpoints = names
      .collect { case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
        (n.take(20).toLong, n) }
      .filter(_._1 <= versionAsOf).sortBy(_._1)
    require(commits.nonEmpty || checkpoints.nonEmpty,
      s"no Delta commits at or below version $versionAsOf under $root")

    // ---- fold the log: last action per path wins, newest meta wins
    var meta: Option[Meta] = None
    var minReader = 1L
    // path -> (partitionValues, live?)
    val files = scala.collection.mutable.LinkedHashMap
      .empty[String, (Map[String, String], Boolean)]

    def applyAdd(path: String, pv: Map[String, String]): Unit =
      files.update(path, (pv, true))
    def applyRemove(path: String): Unit =
      files.updateWith(path) {
        case Some((pv, _)) => Some((pv, false))
        case None => Some((Map.empty, false))
      }

    checkpoints.lastOption.foreach { case (_, cpName) =>
      // checkpoint = the folded state at that version, as parquet rows
      // with one non-null action struct each — Spark's parquet reader
      // IS the checkpoint reader
      val cp = spark.read.parquet(log.resolve(cpName).toString)
      val cols = cp.columns.toSet
      if (cols("metaData"))
        cp.where(col("metaData.schemaString").isNotNull)
          .select(col("metaData.schemaString"),
            col("metaData.partitionColumns"))
          .collect().lastOption.foreach { r =>
            meta = Some(Meta(
              DataType.fromJson(r.getString(0)).asInstanceOf[StructType],
              Option(r.getSeq[String](1)).getOrElse(Seq.empty)))
          }
      if (cols("protocol"))
        cp.where(col("protocol.minReaderVersion").isNotNull)
          .select(col("protocol.minReaderVersion").cast("long"))
          .collect().foreach(r => minReader = math.max(minReader, r.getLong(0)))
      if (cols("add"))
        cp.where(col("add.path").isNotNull)
          .select(col("add.path"), col("add.partitionValues"))
          .collect().foreach { r =>
            applyAdd(r.getString(0),
              Option(r.getMap[String, String](1)).map(_.toMap)
                .getOrElse(Map.empty))
          }
    }

    val cpVersion = checkpoints.lastOption.map(_._1).getOrElse(-1L)
    commits.filter(_._1 > cpVersion).foreach { case (_, name) =>
      Files.readAllLines(log.resolve(name), StandardCharsets.UTF_8)
        .asScala.filter(_.trim.nonEmpty).foreach { line =>
          parseAction(line) match {
            case ("metaData", m) =>
              meta = Some(Meta(
                DataType.fromJson(jsonStr(m, "schemaString")
                  .getOrElse(sys.error(s"metaData without schemaString: $line")))
                  .asInstanceOf[StructType],
                jsonStrArray(m, "partitionColumns")))
            case ("protocol", m) =>
              minReader = math.max(minReader,
                jsonNum(m, "minReaderVersion").getOrElse(1L))
            case ("add", m) =>
              applyAdd(jsonStr(m, "path").getOrElse(
                sys.error(s"add without path: $line")), jsonStrMap(m, "partitionValues"))
            case ("remove", m) =>
              jsonStr(m, "path").foreach(applyRemove)
            case _ => () // commitInfo / txn / cdc — irrelevant to reads
          }
        }
    }

    require(minReader <= 2,
      s"Delta table at $root needs minReaderVersion=$minReader; this " +
        "reader implements protocol <= 2 (no deletion vectors / column " +
        "mapping / v2 checkpoints) and refuses rather than mis-reads")
    val m = meta.getOrElse(sys.error(s"no metaData action found in $root"))
    val live = files.collect { case (p, (pv, true)) => (p, pv) }.toSeq

    val dataCols = m.schema.fields.filterNot(f => m.partitionCols.contains(f.name))
    val dataSchema = StructType(dataCols)
    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      val dp = Paths.get(decoded)
      if (dp.isAbsolute) decoded else Paths.get(root).resolve(decoded).toString
    }

    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)

    // one scan per distinct partition-value tuple (files grouped), the
    // log-supplied values injected as typed literals — how engines
    // without Delta's own scan node read partitioned tables
    val bySpec = live.groupBy(_._2).toSeq
    val parts = bySpec.map { case (pv, group) =>
      val base = spark.read.schema(dataSchema)
        .parquet(group.map(g => resolve(g._1)): _*)
      val withParts = m.partitionCols.foldLeft(base) { (df, pc) =>
        val f = m.schema.fields.find(_.name == pc)
          .getOrElse(sys.error(s"partition column $pc missing from schema"))
        val raw = pv.get(pc).orNull
        df.withColumn(pc,
          (if (raw == null) lit(null) else lit(raw)).cast(f.dataType))
      }
      withParts.select(m.schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    parts.reduce(_.unionAll(_))
  }

  // ---- tiny single-purpose JSON access (the log's action objects are
  // flat; Spark parses the nested schemaString itself via
  // DataType.fromJson, so only string/number/string-map/string-array
  // field extraction is needed here — same budget-free approach as
  // GraftTable's manifest serde, but tokenizer-based so nested braces
  // and escaped quotes inside schemaString can't confuse it)

  /** Returns (actionName, bodyJson) for a log line `{"<action>": {...}}`. */
  private def parseAction(line: String): (String, String) = {
    val t = line.trim
    val k = """^\{\s*"([A-Za-z]+)"\s*:""".r.findFirstMatchIn(t)
      .getOrElse(sys.error(s"unparseable Delta log line: ${t.take(80)}"))
    (k.group(1), t.substring(k.end))
  }

  /** Scan for `"key": <string>` at any depth, returning the FIRST hit —
    * log action bodies never repeat a key. Handles escapes. */
  private def jsonStr(json: String, key: String): Option[String] = {
    val needle = s""""$key""""
    val i = json.indexOf(needle)
    if (i < 0) return None
    var j = json.indexOf('"', json.indexOf(':', i + needle.length) + 1)
    if (j < 0) return None
    val sb = new StringBuilder
    j += 1
    while (j < json.length && json(j) != '"') {
      if (json(j) == '\\' && j + 1 < json.length) {
        json(j + 1) match {
          case '"' => sb += '"'
          case '\\' => sb += '\\'
          case '/' => sb += '/'
          case 'n' => sb += '\n'
          case 't' => sb += '\t'
          case 'r' => sb += '\r'
          case 'u' =>
            sb += Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar
            j += 4
          case other => sb += other
        }
        j += 2
      } else { sb += json(j); j += 1 }
    }
    Some(sb.result())
  }

  private def jsonNum(json: String, key: String): Option[Long] =
    s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)

  /** `"key": ["a", "b"]` — flat string arrays only (partitionColumns). */
  private def jsonStrArray(json: String, key: String): Seq[String] = {
    val m = (s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(json)
    m.map(_.group(1)).toSeq.flatMap(body =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body).map(_.group(1)))
  }

  /** `"key": {"a": "x", "b": null}` — flat string→string maps only
    * (partitionValues). JSON nulls are preserved as nulls. */
  private def jsonStrMap(json: String, key: String): Map[String, String] = {
    val start = json.indexOf(s""""$key"""")
    if (start < 0) return Map.empty
    val open = json.indexOf('{', start)
    if (open < 0) return Map.empty
    val close = json.indexOf('}', open)
    val body = json.substring(open + 1, if (close < 0) json.length else close)
    val entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|null)".r
    entry.findAllMatchIn(body).map { mm =>
      val v = mm.group(2)
      mm.group(1) -> (if (v == "null") null else v.substring(1, v.length - 1))
    }.toMap
  }
}
