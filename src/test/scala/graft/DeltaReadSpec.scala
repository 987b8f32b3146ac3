package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.DeltaRead

/** Read-side interop with the open Delta Lake protocol, proven against
  * HAND-AUTHORED tables (no Delta library exists in the dependency
  * budget to write fixtures — which is the point: the format is plain
  * JSON + parquet, and these fixtures follow PROTOCOL.md literally).
  * Covers: state fold (adds minus removes), time travel, partition
  * values injected from the log, URL-encoded paths, checkpoint-parquet
  * bootstrap with vacuumed JSON commits, and the loud refusal of
  * reader features this implementation does not have. */
class DeltaReadSpec extends SparkSpec {

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def freshTable(): String =
    Files.createTempDirectory("graft_delta_").toString

  /** Writes `df` as ONE parquet file named `name` under `root`. */
  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.move(part, Paths.get(root, name), StandardCopyOption.REPLACE_EXISTING)
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  private def writeCommit(root: String, v: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(root, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def protoLine(v: Int = 1) =
    s"""{"protocol":{"minReaderVersion":$v,"minWriterVersion":2}}"""

  private def metaLine(schemaJson: String, partCols: Seq[String] = Nil) =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partCols.map(c => s""""$c"""").mkString(",")}],""" +
      s""""configuration":{},"createdTime":1700000000000}}"""

  private def addLine(path: String, pv: String = "{}") =
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":1,""" +
      s""""modificationTime":1700000000000,"dataChange":true}}"""

  private def removeLine(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000001000,"dataChange":true}}"""

  test("reads a basic table: adds folded, URL-encoded paths resolved") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val f2 = Seq((3L, "c")).toDF("id", "v")
    dataFile(root, "f one.parquet", f1) // space → %20 in the log
    dataFile(root, "f2.parquet", f2)
    writeCommit(root, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f%20one.parquet"), addLine("f2.parquet")))
    val got = DeltaRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "v"))
    assert(got.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("remove supersedes add; versionAsOf time-travels the fold") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    val f2 = Seq((2L, "b")).toDF("id", "v")
    val f3 = Seq((3L, "c")).toDF("id", "v")
    Seq(("f1.parquet", f1), ("f2.parquet", f2), ("f3.parquet", f3))
      .foreach { case (n, d) => dataFile(root, n, d) }
    writeCommit(root, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f1.parquet"), addLine("f2.parquet")))
    writeCommit(root, 1, Seq(removeLine("f2.parquet"), addLine("f3.parquet")))

    val latest = DeltaRead.read(spark, root)
    assert(latest.select("id").orderBy("id").collect().map(_.getLong(0))
      .toSeq === Seq(1L, 3L), "remove not applied or add lost")
    val v0 = DeltaRead.read(spark, root, versionAsOf = 0)
    assert(v0.select("id").orderBy("id").collect().map(_.getLong(0))
      .toSeq === Seq(1L, 2L), "time travel leaked post-version actions")
  }

  test("partition values come from the log, typed, including null") {
    import spark.implicits._
    val root = freshTable()
    // partition column `p` is NOT in the data files — protocol rule
    val f1 = Seq((1L, "a")).toDF("id", "v")
    val f2 = Seq((2L, "b")).toDF("id", "v")
    val f3 = Seq((3L, "c")).toDF("id", "v")
    Seq(("f1.parquet", f1), ("f2.parquet", f2), ("f3.parquet", f3))
      .foreach { case (n, d) => dataFile(root, n, d) }
    val full = Seq((1L, "a", 10)).toDF("id", "v", "p") // p INT to prove cast
    writeCommit(root, 0, Seq(protoLine(), metaLine(full.schema.json, Seq("p")),
      addLine("f1.parquet", """{"p":"10"}"""),
      addLine("f2.parquet", """{"p":"20"}"""),
      addLine("f3.parquet", """{"p":null}""")))
    val got = DeltaRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "v", "p"))
    assert(got.schema("p").dataType.typeName === "integer")
    assert(got.orderBy("id").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toSeq === Seq((1L, 10), (2L, 20), (3L, -1)))
  }

  test("checkpoint parquet bootstraps a vacuumed log") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    val f3 = Seq((3L, "c")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    dataFile(root, "f3.parquet", f3)
    val schemaJson = f1.schema.json

    // checkpoint at version 1 = the folded state (protocol + metaData
    // + live adds), one action struct per row — ordinary parquet
    val proto = spark.sql("SELECT named_struct('minReaderVersion', 1, " +
      "'minWriterVersion', 2) AS protocol")
    val meta = spark.sql(
      s"SELECT named_struct('id', 'fixture', 'schemaString', ${
        "'" + schemaJson.replace("'", "''") + "'"
      }, 'partitionColumns', CAST(array() AS ARRAY<STRING>)) AS metaData")
    val adds = spark.sql("SELECT named_struct('path', 'f1.parquet', " +
      "'partitionValues', CAST(map() AS MAP<STRING,STRING>)) AS add")
    val cp = proto.unionByName(meta, allowMissingColumns = true)
      .unionByName(adds, allowMissingColumns = true)
    val log = Paths.get(root, "_delta_log")
    Files.createDirectories(log)
    dataFile(log.toString, f"${1L}%020d.checkpoint.parquet", cp)
    // the pre-checkpoint JSON commits were vacuumed — only a LATER
    // commit exists; a reader that ignores the checkpoint sees no
    // metaData at all and must fail, so success proves the bootstrap
    writeCommit(root, 2, Seq(addLine("f3.parquet")))
    val got = DeltaRead.read(spark, root)
    assert(got.select("id").orderBy("id").collect().map(_.getLong(0))
      .toSeq === Seq(1L, 3L))
  }

  test("refuses reader features beyond protocol 2 instead of mis-reading") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    writeCommit(root, 0, Seq(protoLine(v = 3), metaLine(f1.schema.json),
      addLine("f1.parquet")))
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e.getMessage.contains("minReaderVersion=3"))
  }

  test("importDelta snapshots into a range-clustered GraftTable") {
    import spark.implicits._
    val root = freshTable()
    val df = (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v")
    dataFile(root, "f1.parquet", df)
    writeCommit(root, 0, Seq(protoLine(), metaLine(df.schema.json),
      addLine("f1.parquet")))
    val gt = Files.createTempDirectory("graft_import_").toString
    val snap = graft.sources.GraftTable.importDelta(spark, root, gt, "id", 2)
    assert(snap.version === 1 && snap.files.size === 2)
    val back = graft.sources.GraftTable.read(spark, gt)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "import changed table contents")
    // range clustering from day one: non-overlapping key intervals
    snap.files.sortBy(_.minKey).sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey < b.minKey)
      case _ =>
    }
  }

  test("minReaderVersion=2 without column mapping reads fine") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    writeCommit(root, 0, Seq(protoLine(v = 2), metaLine(f1.schema.json),
      addLine("f1.parquet")))
    val got = DeltaRead.read(spark, root)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a")))
  }

  test("column mapping: unknown modes refuse; mapped schemas missing " +
      "physicalName/id metadata refuse") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    // both mapped modes are READ (next tests) — but only when every
    // field actually carries the metadata its resolution rule needs;
    // a mapped schema without it cannot resolve and must not NULL.
    def metaCm(mode: String, schemaJson: String = f1.schema.json) =
      s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(schemaJson)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"$mode"},"createdTime":0}}"""
    writeCommit(root, 0, Seq(protoLine(v = 2), metaCm("zzz"), addLine("f1.parquet")))
    val e0 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e0.getMessage.contains("unknown"))
    writeCommit(root, 0, Seq(protoLine(v = 2), metaCm("name"), addLine("f1.parquet")))
    val e2 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e2.getMessage.contains("physicalName"))
    writeCommit(root, 0, Seq(protoLine(v = 2), metaCm("id"), addLine("f1.parquet")))
    val e1 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e1.getMessage.contains("physicalName"))
    // physicalName present but no columnMapping.id: id mode still refuses
    val schemaPhysOnly = {
      import org.apache.spark.sql.types._
      StructType(Seq(
        StructField("id", LongType, nullable = true, new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col-aaa").build()),
        StructField("v", StringType, nullable = true, new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col-bbb").build())))
        .json
    }
    writeCommit(root, 0, Seq(protoLine(v = 2), metaCm("id", schemaPhysOnly),
      addLine("f1.parquet")))
    val e3 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e3.getMessage.contains("columnMapping.id"))
  }

  test("column mapping id mode: footer field ids resolve renames, " +
      "ignore physical-name drift and column order") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshTable()
    def idF(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    def cmMeta(fields: Seq[StructField]) =
      s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(StructType(fields).json)},""" +
        s""""partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"},"createdTime":0}}"""
    // data files carry parquet FOOTER field ids (stamped by Spark's
    // writer from parquet.field.id metadata)
    def withFooterIds(names: Seq[(String, Long)], rows: Seq[(Long, String)]) = {
      val sch = StructType(Seq(
        StructField(names(0)._1, LongType, nullable = true, new MetadataBuilder()
          .putLong("parquet.field.id", names(0)._2).build()),
        StructField(names(1)._1, StringType, nullable = true, new MetadataBuilder()
          .putLong("parquet.field.id", names(1)._2).build())))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1), sch)
    }

    dataFile(root, "f1.parquet",
      withFooterIds(Seq("col-aaa" -> 1L, "col-bbb" -> 2L), Seq((1L, "a"))))
    writeCommit(root, 0, Seq(protoLine(v = 2),
      cmMeta(Seq(idF("id", LongType, "col-aaa", 1),
        idF("v", StringType, "col-bbb", 2))),
      addLine("f1.parquet")))
    // v1: rename v -> w (id 2 unchanged) AND a new file whose physical
    // NAMES drifted (a foreign writer may re-derive them) — id
    // resolution must bind by footer id, not name
    dataFile(root, "f2.parquet",
      withFooterIds(Seq("col-aaa" -> 1L, "totally-else" -> 2L),
        Seq((2L, "b"))))
    writeCommit(root, 1, Seq(
      cmMeta(Seq(idF("id", LongType, "col-aaa", 1),
        idF("w", StringType, "col-bbb", 2))),
      addLine("f2.parquet")))

    val v0 = DeltaRead.read(spark, root, 0)
    assert(v0.columns.toSeq == Seq("id", "v"))
    assert(v0.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a")))
    val v1 = DeltaRead.read(spark, root, 1)
    assert(v1.columns.toSeq == Seq("id", "w"))
    assert(v1.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))

    // an id-less data file in an id-mapped table errors LOUDLY
    dataFile(root, "noids.parquet", Seq((9L, "z")).toDF("col-aaa", "col-bbb"))
    writeCommit(root, 2, Seq(addLine("noids.parquet")))
    val e = intercept[Exception] {
      DeltaRead.read(spark, root, 2).collect()
    }
    assert(e.getMessage.contains("field Id") ||
      Option(e.getCause).exists(_.getMessage.contains("field Id")))
  }

  test("column mapping name mode: renamed and dropped columns read " +
      "correctly at every version") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshTable()
    def mf(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    def cmMeta(fields: Seq[StructField]) =
      s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(StructType(fields).json)},""" +
        s""""partitionColumns":["p"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}"""
    val idF = mf("id", LongType, "col-aaa", 1)
    val pF = mf("p", StringType, "col-ppp", 3)

    // data files carry PHYSICAL names; partitionValues use PHYSICAL keys
    dataFile(root, "f1.parquet", Seq((1L, "a")).toDF("col-aaa", "col-bbb"))
    writeCommit(root, 0, Seq(protoLine(v = 2),
      cmMeta(Seq(idF, mf("v", StringType, "col-bbb", 2), pF)),
      addLine("f1.parquet", """{"col-ppp":"x"}""")))
    // v1: RENAME v -> w (same physical col-bbb), new file in p=y
    dataFile(root, "f2.parquet", Seq((2L, "b")).toDF("col-aaa", "col-bbb"))
    writeCommit(root, 1, Seq(
      cmMeta(Seq(idF, mf("w", StringType, "col-bbb", 2), pF)),
      addLine("f2.parquet", """{"col-ppp":"y"}""")))
    // v2: DROP w, ADD n (fresh physical col-ccc)
    dataFile(root, "f3.parquet", Seq((3L, 9L)).toDF("col-aaa", "col-ccc"))
    writeCommit(root, 2, Seq(
      cmMeta(Seq(idF, mf("n", LongType, "col-ccc", 4), pF)),
      addLine("f3.parquet", """{"col-ppp":"z"}""")))

    val v0 = DeltaRead.read(spark, root, 0)
    assert(v0.columns.toSeq == Seq("id", "v", "p"))
    assert(v0.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet == Set((1L, "a", "x")))

    // pre-rename files read under the NEW logical name (same physical)
    val v1 = DeltaRead.read(spark, root, 1)
    assert(v1.columns.toSeq == Seq("id", "w", "p"))
    assert(v1.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet == Set((1L, "a", "x"), (2L, "b", "y")))
    // partition filtering works on the logical name
    assert(v1.where($"p" === "y").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))

    // dropped column gone; files predating col-ccc return NULL for n
    val v2 = DeltaRead.read(spark, root, 2)
    assert(v2.columns.toSeq == Seq("id", "n", "p"))
    assert(v2.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
      .toSet == Set((1L, None, "x"), (2L, None, "y"), (3L, Some(9L), "z")))

    // writes to mapped tables WORK since r15 — the writer emits
    // physical names (DeltaMappedWriteSpec covers the full lifecycle)
    graft.sources.DeltaWrite.append(spark,
      Seq((4L, 1L, "q")).toDF("id", "n", "p"), root)
    assert(DeltaRead.read(spark, root).where($"id" === 4L)
      .select("n").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("refuses a log with a version gap, naming unusable checkpoints") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    writeCommit(root, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f1.parquet")))
    writeCommit(root, 2, Seq(addLine("f1.parquet"))) // gap: no version 1
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e.getMessage.contains("gap") && e.getMessage.contains("expected commit version 1"))

    // a table whose JSON commits were cleaned past an INCOMPLETE
    // multi-part checkpoint (complete ones read since the r14
    // checkpoint-forms work — DeltaCheckpointSpec): the surviving
    // commits don't start at 0 and the only checkpoint is unusable —
    // the refusal must say so instead of folding from -1 over the tail
    val root2 = freshTable()
    dataFile(root2, "f1.parquet", f1)
    val log2 = Paths.get(root2, "_delta_log")
    Files.createDirectories(log2)
    // one surviving part of a two-part checkpoint at version 1
    dataFile(log2.toString, f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet", f1)
    writeCommit(root2, 2, Seq(addLine("f1.parquet")))
    val e2 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root2) }
    assert(e2.getMessage.contains("incomplete") &&
      e2.getMessage.contains("1 of 2 parts"),
      s"refusal should name the incomplete multi-part checkpoint: ${e2.getMessage}")
  }

  test("field order and adversarial values can't confuse the parse") {
    import spark.implicits._
    val root = freshTable()
    // partition VALUE containing braces + an add whose `stats` string
    // precedes `path` and itself CONTAINS "path": the r12 tokenizers
    // truncated the partitionValues body at the first `}` and matched
    // the stats-embedded "path" — a full JSON parse cannot be fooled
    val f1 = Seq((1L, "a")).toDF("id", "v")
    val f2 = Seq((2L, "b")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    dataFile(root, "f2.parquet", f2)
    val full = Seq((1L, "a", "x")).toDF("id", "v", "p")
    val add1 =
      """{"add":{"stats":"{\"numRecords\":1,\"minValues\":{\"path\":\"zzz\"}}",""" +
        """"partitionValues":{"p":"{weird}brace"},"path":"f1.parquet",""" +
        """"size":1,"modificationTime":0,"dataChange":true}}"""
    val add2 =
      """{"add":{"partitionValues":{"p":"plain"},"path":"f2.parquet",""" +
        """"size":1,"modificationTime":0,"dataChange":true}}"""
    writeCommit(root, 0, Seq(protoLine(), metaLine(full.schema.json, Seq("p")),
      add1, add2))
    val got = DeltaRead.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "a", "{weird}brace"), (2L, "b", "plain")))
  }

  test("flat-plan fallback: many hive-laid partitions plan ONE scan, rows identical") {
    import spark.implicits._
    val root = freshTable()
    val nParts = 8
    // hive-style layout: p=<v>/f<v>.parquet, partition col NOT in data
    (0 until nParts).foreach { p =>
      Files.createDirectories(Paths.get(root, s"p=$p"))
      dataFile(Paths.get(root, s"p=$p").toString, s"f$p.parquet",
        Seq((p.toLong, s"v$p")).toDF("id", "v"))
    }
    val full = Seq((1L, "a", 7)).toDF("id", "v", "p")
    writeCommit(root, 0, Seq(protoLine(), metaLine(full.schema.json, Seq("p"))) ++
      (0 until nParts).map(p =>
        addLine(s"p=$p/f$p.parquet", s"""{"p":"$p"}""")))

    def readWithLimit(limit: Int) = {
      spark.conf.set("spark.graft.delta.unionPartitionLimit", limit.toString)
      try DeltaRead.read(spark, root)
      finally spark.conf.unset("spark.graft.delta.unionPartitionLimit")
    }
    val union = readWithLimit(1000) // default shape
    val flat = readWithLimit(4)     // tuple count 8 > 4 → flat scan

    // row-identical, schema-identical
    assert(flat.schema === union.schema)
    assert(flat.exceptAll(union).isEmpty && union.exceptAll(flat).isEmpty,
      "flat-plan fallback changed table contents")
    assert(flat.schema("p").dataType.typeName === "integer")

    // the whole point: ONE scan node instead of nParts unioned scans
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }.size
    assert(scanCount(flat) === 1,
      s"flat plan should carry exactly 1 scan, got ${scanCount(flat)}")
    assert(scanCount(union) === nParts)

    // and partition pruning still happens at planning time
    spark.conf.set("spark.graft.delta.unionPartitionLimit", "4")
    try {
      val pruned = DeltaRead.read(spark, root).where(col("p") === 3)
      val scan = pruned.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f }.get
      val dirs = scan.selectedPartitions.toPartitionArray
        .map(_.filePath.toString).toSeq
      assert(dirs.nonEmpty && dirs.forall(_.contains("p=3")),
        s"scan should touch only p=3, got $dirs")
      assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(3L))
    } finally spark.conf.unset("spark.graft.delta.unionPartitionLimit")
  }

  test("flat-plan fallback declines un-provable layouts (escaped/null values)") {
    import spark.implicits._
    val root = freshTable()
    // values that NEED escaping (colon) or are null: the fallback must
    // decline and the union path must still read them value-exactly
    val f1 = Seq((1L, "a")).toDF("id", "v")
    val f2 = Seq((2L, "b")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    dataFile(root, "f2.parquet", f2)
    val full = Seq((1L, "a", "x")).toDF("id", "v", "p")
    writeCommit(root, 0, Seq(protoLine(), metaLine(full.schema.json, Seq("p")),
      addLine("f1.parquet", """{"p":"a:b"}"""),
      addLine("f2.parquet", """{"p":null}""")))
    spark.conf.set("spark.graft.delta.unionPartitionLimit", "1")
    try {
      val got = DeltaRead.read(spark, root).orderBy("id").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)).getOrElse("<null>"))).toSeq
      assert(got === Seq((1L, "a:b"), (2L, "<null>")))
    } finally spark.conf.unset("spark.graft.delta.unionPartitionLimit")
  }

  test("schemaString with escaped quotes and nested braces parses") {
    import spark.implicits._
    val root = freshTable()
    // a column comment carrying quotes + braces exercises the
    // tokenizer-based string extraction the regex approach would break on
    val df = Seq((1L, "a")).toDF("id", "v")
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields.map(
      _.withComment("""has "quotes" and {braces}""")))
    dataFile(root, "f1.parquet", df)
    writeCommit(root, 0, Seq(protoLine(), metaLine(schema.json),
      addLine("f1.parquet")))
    val got = DeltaRead.read(spark, root)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a")))
  }
}
