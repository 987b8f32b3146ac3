package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.sources.{DeltaRead, DeltaWrite, GraftTable}
import graft.util.Json

/** Write-side Delta interop. No independent Delta implementation fits
  * the offline dependency budget, so conformance is proven three-way:
  * (1) GOLDEN assertions on the raw `_delta_log` JSON the writer emits
  * — every action line parsed and checked against PROTOCOL.md's
  * required fields and partition-value serialization; (2) round-trip
  * through [[DeltaRead]], which was pinned against hand-authored
  * fixtures and the DeltaFoldProps model BEFORE the writer existed (a
  * writer bug and a reader bug would have to cancel exactly); (3) the
  * refusal surface — everything the writer promises to reject loudly,
  * rejected loudly. DeltaWriteProps adds the model-based random-
  * sequence property on top. */
class DeltaWriteSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_deltaw_").toString

  private def df3: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y")).toDF("id", "v", "p")
  }

  private def logLines(root: String, v: Long): Seq[Map[String, Any]] =
    Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json"), StandardCharsets.UTF_8)
      .asScala.filter(_.trim.nonEmpty)
      .map(Json.parse(_).asInstanceOf[Map[String, Any]]).toSeq

  test("create writes a spec-shaped v0 log: protocol, metaData, adds") {
    val root = fresh()
    assert(DeltaWrite.create(spark, df3, root, partitionBy = Seq("p")) == 0L)
    val lines = logLines(root, 0)

    val proto = lines.flatMap(l => Option(Json.get(l, "protocol")))
    assert(proto.size == 1)
    assert(Json.long(proto.head, "minReaderVersion").contains(1L))
    assert(Json.long(proto.head, "minWriterVersion").contains(2L))

    val meta = lines.flatMap(l => Option(Json.get(l, "metaData")))
    assert(meta.size == 1)
    assert(Json.str(meta.head, "id").exists(_.nonEmpty))
    assert(Json.str(meta.head, "format", "provider").contains("parquet"))
    assert(Json.list(meta.head, "partitionColumns") == List("p"))
    // schemaString must be Spark-schema JSON for the DATA+PARTITION cols
    val ss = Json.str(meta.head, "schemaString").get
    assert(org.apache.spark.sql.types.DataType.fromJson(ss)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("id", "v", "p"))

    val adds = lines.flatMap(l => Option(Json.get(l, "add")))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val path = Json.str(a, "path").get
      assert(!path.startsWith("/"), "add.path must be table-root-relative")
      assert(path.matches("p=[xy]/.*\\.parquet"))
      assert(Json.get(a, "partitionValues").asInstanceOf[Map[String, Any]]
        .keySet == Set("p"))
      assert(Json.long(a, "size").exists(_ > 0))
      assert(Json.long(a, "modificationTime").exists(_ > 0))
      assert(Json.get(a, "dataChange") == true)
      // stats is a JSON STRING carrying numRecords
      val stats = Json.parse(Json.str(a, "stats").get)
      assert(Json.long(stats, "numRecords").exists(_ > 0))
    }
    val n = adds.map(a => Json.long(Json.parse(Json.str(a, "stats").get),
      "numRecords").get).sum
    assert(n == 3L, "add.stats numRecords must sum to the row count")
  }

  test("create/append/overwrite round-trip through DeltaRead at every version") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root, partitionBy = Seq("p"))
    DeltaWrite.append(spark, Seq((4L, "d", "y")).toDF("id", "v", "p"), root)
    DeltaWrite.overwrite(spark, Seq((9L, "z", "w")).toDF("id", "v", "p"), root)

    def ids(v: Int) = DeltaRead.read(spark, root, v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(0) == Set(1L, 2L, 3L))
    assert(ids(1) == Set(1L, 2L, 3L, 4L))
    assert(ids(2) == Set(9L))
    // partition values come back typed from the log
    assert(DeltaRead.read(spark, root, 1).where($"p" === "y")
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // data files must NOT contain the partition column (protocol layout)
    val aFile = Files.walk(Paths.get(root)).iterator().asScala
      .find(p => p.toString.contains("p=x") && p.toString.endsWith(".parquet"))
      .get
    assert(spark.read.parquet(aFile.toString).columns.toSeq == Seq("id", "v"))
  }

  test("append aligns columns by name and refuses real mismatches") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root)
    // reordered columns are fine — alignment is by name
    DeltaWrite.append(spark,
      Seq(("e", 5L, "z")).toDF("v", "id", "p"), root)
    assert(DeltaRead.read(spark, root).count() == 4)
    // missing column
    val e1 = intercept[Exception] {
      DeltaWrite.append(spark, Seq((6L, "f")).toDF("id", "v"), root)
    }
    assert(e1.getMessage.contains("schema mismatch"))
    // type mismatch
    val e2 = intercept[Exception] {
      DeltaWrite.append(spark, Seq((7, "g", "z")).toDF("id", "v", "p"), root)
    }
    assert(e2.getMessage.contains("table type"))
  }

  test("partition values with hive-escaped characters round-trip exactly") {
    import spark.implicits._
    val root = fresh()
    // ':' '=' '%' and a space — ':'/'='/'%' get hive-%xx-escaped in the
    // dir name, the space gets percent-encoded in add.path; the LOG
    // must carry the raw value and the read must return it verbatim
    val tricky = Seq((1L, "a:b"), (2L, "c=d"), (3L, "e%f"), (4L, "g h"))
      .toDF("id", "p")
    DeltaWrite.create(spark, tricky, root, partitionBy = Seq("p"))
    val got = DeltaRead.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a:b", 2L -> "c=d", 3L -> "e%f", 4L -> "g h"))
    val adds = logLines(root, 0).flatMap(l => Option(Json.get(l, "add")))
    val pvs = adds.map(a => Json.str(a, "partitionValues", "p").get).toSet
    assert(pvs == Set("a:b", "c=d", "e%f", "g h"),
      "the log carries RAW values, not their path escapes")
  }

  test("null partition values are legal; ambiguous hive forgeries refuse") {
    import spark.implicits._
    val root = fresh()
    val withNull = Seq((1L, Some("x")), (2L, None))
      .toDF("id", "p")
    DeltaWrite.create(spark, withNull, root, partitionBy = Seq("p"))
    val adds = logLines(root, 0).flatMap(l => Option(Json.get(l, "add")))
    assert(adds.exists(a =>
      Json.get(a, "partitionValues").asInstanceOf[Map[String, Any]]("p") == null),
      "null partition value must serialize as JSON null")
    val back = DeltaRead.read(spark, root).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back == Map(1L -> Some("x"), 2L -> None))

    // the two values hive layout cannot distinguish from null: refuse
    val r2 = fresh()
    val e = intercept[Exception] {
      DeltaWrite.create(spark, Seq((1L, "")).toDF("id", "p"), r2, Seq("p"))
    }
    assert(e.getMessage.contains("not representable"))
    val r3 = fresh()
    val e2 = intercept[Exception] {
      DeltaWrite.create(spark,
        Seq((1L, "__HIVE_DEFAULT_PARTITION__")).toDF("id", "p"), r3, Seq("p"))
    }
    assert(e2.getMessage.contains("not representable"))
  }

  test("refusals: existing table, absent table, writer protocol, appendOnly, " +
      "invariants, unsupported partition type") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root)
    assert(intercept[Exception] {
      DeltaWrite.create(spark, df3, root)
    }.getMessage.contains("already exists"))
    assert(intercept[Exception] {
      DeltaWrite.append(spark, df3, fresh())
    }.getMessage.contains("not a Delta table"))

    // minWriterVersion=3 table (hand-authored) — writes refused
    val v3 = fresh()
    val log = Paths.get(v3, "_delta_log")
    Files.createDirectories(log)
    val schema = Seq((1L, "a", "x")).toDF("id", "v", "p").schema.json
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // r15: a bare legacy version no longer refuses — the feature has
    // to be USED (here: an actual CHECK constraint this writer cannot
    // evaluate)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""" + "\n" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schema)},"partitionColumns":[],"configuration":{"delta.constraints.c0":"id > 0"},"createdTime":0}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    assert(intercept[Exception] {
      DeltaWrite.append(spark, df3, v3)
    }.getMessage.contains("CHECK"))

    // delta.appendOnly=true refuses overwrite, allows append
    val ao = fresh()
    DeltaWrite.create(spark, df3, ao,
      configuration = Map("delta.appendOnly" -> "true"))
    DeltaWrite.append(spark, df3, ao)
    assert(intercept[Exception] {
      DeltaWrite.overwrite(spark, df3, ao)
    }.getMessage.contains("appendOnly"))

    // a schema declaring delta.invariants refuses (we don't evaluate them)
    val inv = fresh()
    val invSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.invariants", """{"expression":{"expression":"id > 0"}}""")
          .build())))
    val invDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)), 1),
      invSchema)
    assert(intercept[Exception] {
      DeltaWrite.create(spark, invDf, inv)
    }.getMessage.contains("delta.invariants"))

    // timestamp partition columns: spec serialization != hive dir form
    assert(intercept[Exception] {
      DeltaWrite.create(spark,
        Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          .toDF("id", "ts"), fresh(), Seq("ts"))
    }.getMessage.contains("serialization"))
  }

  test("concurrent appends: both commits land at distinct versions, " +
      "no rows lost") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, Seq((0L, "seed", "s")).toDF("id", "v", "p"), root)
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    try {
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            DeltaWrite.append(spark,
              Seq((i.toLong, s"w$i", "c")).toDF("id", "v", "p"), root)
          }
        })
      }
      gate.countDown()
      val versions = futures.map(_.get(120, TimeUnit.SECONDS))
      assert(versions.toSet.size == 4, s"versions must be distinct: $versions")
      assert(versions.toSet == Set(1L, 2L, 3L, 4L))
    } finally pool.shutdownNow()
    assert(DeltaRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("delete rewrites ONLY the files holding matching rows; " +
      "NULL predicate keeps the row") {
    import spark.implicits._
    val root = fresh()
    // two partitions → two data files; matches live only in p=x
    DeltaWrite.create(spark,
      Seq((1L, Some("a"), "x"), (2L, Some("b"), "x"), (3L, None, "y"))
        .toDF("id", "v", "p"), root, partitionBy = Seq("p"))
    val before = logLines(root, 0)
      .flatMap(l => Json.str(Json.get(l, "add"), "path")).toSet

    val v = DeltaWrite.delete(spark, root,
      org.apache.spark.sql.functions.col("v") === "a")
    assert(v == 1L)
    val lines = logLines(root, 1)
    val removed = lines.flatMap(l => Json.str(Json.get(l, "remove"), "path"))
    // only the p=x file(s) rewritten; p=y untouched
    assert(removed.nonEmpty && removed.forall(_.startsWith("p=x")))
    assert(removed.toSet.subsetOf(before))
    // row 3 has v = NULL: predicate NULL → row KEPT (SQL delete semantics)
    val back = DeltaRead.read(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(back == Set(2L, 3L))

    // no-match delete: no new version committed
    assert(DeltaWrite.delete(spark, root,
      org.apache.spark.sql.functions.col("v") === "zzz") == 1L)
    assert(!Files.exists(Paths.get(root, "_delta_log", f"${2L}%020d.json")))

    // appendOnly refuses
    val ao = fresh()
    DeltaWrite.create(spark, df3, ao,
      configuration = Map("delta.appendOnly" -> "true"))
    assert(intercept[Exception] {
      DeltaWrite.delete(spark, ao,
        org.apache.spark.sql.functions.col("id") === 1L)
    }.getMessage.contains("appendOnly"))
  }

  test("checkpoint bootstraps the reader after the JSON tail is vacuumed") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root, partitionBy = Seq("p"))
    DeltaWrite.append(spark, Seq((4L, "d", "y")).toDF("id", "v", "p"), root)
    DeltaWrite.overwrite(spark, Seq((9L, "z", "w"), (10L, "q", "w"))
      .toDF("id", "v", "p"), root)
    assert(DeltaWrite.checkpoint(spark, root) == 2L)
    // vacuum every JSON commit the checkpoint supersedes
    (0L to 2L).foreach { v =>
      Files.delete(Paths.get(root, "_delta_log", f"$v%020d.json"))
    }
    assert(DeltaRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(9L, 10L))
    // and the log keeps working past the checkpoint
    DeltaWrite.append(spark, Seq((11L, "r", "w")).toDF("id", "v", "p"), root)
    assert(DeltaRead.read(spark, root).count() == 3)

    // idempotent re-run: the parquet is a no-op but _last_checkpoint
    // is still (re)written — a crash between the move and the hint
    // write must not leave the hint permanently stale (ADVICE r14)
    val hint = Paths.get(root, "_delta_log", "_last_checkpoint")
    Files.delete(hint) // simulate the crash-after-move
    assert(DeltaWrite.checkpoint(spark, root) == 3L) // fresh cp at v3
    Files.delete(hint)
    assert(DeltaWrite.checkpoint(spark, root) == 3L) // early-return path
    assert(Files.readString(hint).contains("\"version\":3"))
  }

  test("'+' and hive-escaped partition values stay readable and deletable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = fresh()
    // '+' is a LEGAL uri path char: encodePath leaves it literal in
    // add.path, so a form-decoding reader ('+'→space) resolves every
    // file of that partition to a nonexistent path (ADVICE r13 —
    // the table was unreadable). ':' is hive-%xx-escaped on disk, so a
    // double-decoding delete() turned the live-set key into a path
    // that never exists and aborted every matching delete.
    DeltaWrite.create(spark,
      Seq((1L, "a+b"), (2L, "c:d"), (3L, "plain")).toDF("id", "p"),
      root, partitionBy = Seq("p"))
    assert(DeltaRead.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a+b", 2L -> "c:d", 3L -> "plain"))
    assert(DeltaWrite.delete(spark, root, col("p") === "c:d") == 1L)
    assert(DeltaRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(DeltaWrite.delete(spark, root, col("p") === "a+b") == 2L)
    assert(DeltaRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("txn appends are exactly-once: replays skip, racing replays commit once") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root)
    val one = Seq((4L, "d", "y")).toDF("id", "v", "p")
    val v1 = DeltaWrite.append(spark, one, root, txn = Some(("job", 1L)))
    assert(v1 == 1L)
    assert(DeltaRead.read(spark, root).count() == 4)
    // exact replay and an OLDER version both skip without committing
    assert(DeltaWrite.append(spark, one, root, txn = Some(("job", 1L))) == 1L)
    assert(DeltaWrite.append(spark, one, root, txn = Some(("job", 0L))) == 1L)
    assert(DeltaRead.read(spark, root).count() == 4)
    assert(!Files.exists(Paths.get(root, "_delta_log", f"${2L}%020d.json")))
    // the committed txn action is spec-shaped
    val txns = logLines(root, 1).flatMap(l => Option(Json.get(l, "txn")))
    assert(txns.size == 1)
    assert(Json.str(txns.head, "appId").contains("job"))
    assert(Json.long(txns.head, "version").contains(1L))
    // a NEWER version commits
    assert(DeltaWrite.append(spark, one, root, txn = Some(("job", 2L))) == 2L)
    assert(DeltaRead.read(spark, root).count() == 5)

    // racing replays of the SAME (appId, version): exactly one commits
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    try {
      val futures = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            DeltaWrite.append(spark, one, root, txn = Some(("race", 9L)))
          }
        })
      }
      gate.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(DeltaRead.read(spark, root).count() == 6,
      "exactly one of the racing replays may append its batch")
  }

  test("checkpoint preserves protocol, metaData identity, txn ledger, and stats") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, df3, root, partitionBy = Seq("p"))
    val meta0 = logLines(root, 0).flatMap(l => Option(Json.get(l, "metaData"))).head
    val id0 = Json.str(meta0, "id").get
    val ct0 = Json.long(meta0, "createdTime").get
    // a foreign writer bumps the protocol to (2,2) — checkpointing must
    // not downgrade it (ADVICE r13: a fabricated (1,2) makes later
    // writers ignore the table's feature contracts)
    Files.write(Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":2,"minWriterVersion":2}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    DeltaWrite.append(spark, Seq((4L, "d", "y")).toDF("id", "v", "p"), root,
      txn = Some(("app-1", 7L)))
    assert(DeltaWrite.checkpoint(spark, root) == 2L)
    (0L to 2L).foreach(v =>
      Files.delete(Paths.get(root, "_delta_log", f"$v%020d.json")))

    val cp = spark.read.parquet(
      Paths.get(root, "_delta_log", f"${2L}%020d.checkpoint.parquet").toString)
    val proto = cp.where("protocol.minReaderVersion is not null")
      .selectExpr("protocol.minReaderVersion", "protocol.minWriterVersion")
      .collect()
    assert(proto.length == 1 && proto.head.getInt(0) == 2 &&
      proto.head.getInt(1) == 2, "checkpoint must carry the TABLE's protocol")
    val m = cp.where("metaData.id is not null")
      .selectExpr("metaData.id", "metaData.createdTime").collect()
    assert(m.length == 1 && m.head.getString(0) == id0 &&
      m.head.getLong(1) == ct0,
      "metaData.id is immutable for the table's lifetime")
    val addStats = cp.where("add.path is not null")
      .selectExpr("add.stats").collect().map(_.getString(0))
    assert(addStats.nonEmpty && addStats.forall(s =>
      s != null && Json.long(Json.parse(s), "numRecords").exists(_ > 0)),
      "checkpoint adds must retain their stats")

    // the ledger survives the vacuum: a replay folded from the
    // checkpoint alone is still skipped
    assert(DeltaWrite.append(spark,
      Seq((5L, "e", "y")).toDF("id", "v", "p"), root,
      txn = Some(("app-1", 7L))) == 2L)
    assert(DeltaRead.read(spark, root).count() == 4)

    // a legacy table genuinely USING a feature this fold does not
    // reconstruct (a CHECK constraint) refuses to checkpoint; bare
    // legacy versions checkpoint fine since r15 (their state lives
    // entirely in configuration/schema metadata, carried verbatim)
    val v3 = fresh()
    DeltaWrite.create(spark, df3, v3)
    val st3 = DeltaRead.state(spark, v3, Long.MaxValue)
    def jstr2(x: String) =
      "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    Files.write(Paths.get(v3, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""" + "\n" +
        s"""{"metaData":{"id":"${st3.meta.id}","format":{"provider":"parquet","options":{}},"schemaString":${jstr2(st3.meta.schema.json)},"partitionColumns":[],"configuration":{"delta.constraints.c0":"id > 0"},"createdTime":0}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    assert(intercept[Exception] {
      DeltaWrite.checkpoint(spark, v3)
    }.getMessage.contains("CHECK"))
  }

  test("add.stats carry column min/max/nullCount; readBetween skips " +
      "files by them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = fresh()
    val df = spark.range(0, 100).select(
      $"id",
      concat(lit("s"), lpad($"id".cast("string"), 3, "0")).as("s"),
      ($"id" % 2 === 0).as("even"),
      when($"id" % 10 === 0, lit(null).cast("double"))
        .otherwise($"id".cast("double") / 4).as("d"))
    // range-clustered → disjoint id intervals per file, the layout
    // stats-skipping exists for
    DeltaWrite.create(spark, df.repartitionByRange(4, $"id"), root)
    val adds = logLines(root, 0).flatMap(l => Option(Json.get(l, "add")))
    assert(adds.size == 4)
    val stats = adds.map(a => Json.parse(Json.str(a, "stats").get))
    stats.foreach { st =>
      assert(Json.long(st, "numRecords").exists(_ > 0))
      assert(Json.long(st, "minValues", "id").isDefined)
      assert(Json.long(st, "maxValues", "id").get >=
        Json.long(st, "minValues", "id").get)
      assert(Json.str(st, "minValues", "s").exists(_.startsWith("s")))
      assert(Json.long(st, "nullCount", "id").contains(0L))
      assert(Json.long(st, "nullCount", "d").exists(_ > 0L),
        "every 25-row range holds nulls in d")
    }
    assert(stats.map(s => Json.long(s, "minValues", "id").get).min == 0L)
    assert(stats.map(s => Json.long(s, "maxValues", "id").get).max == 99L)
    assert(stats.map(s => Json.str(s, "minValues", "s").get).min == "s000")
    assert(stats.map(s => Json.str(s, "maxValues", "s").get).max == "s099")
    assert(stats.map(s => Json.long(s, "nullCount", "d").get).sum == 10L)

    // the skipping consumer: a closed-interval read plans ONLY the
    // overlapping files and returns the same rows as a full predicate
    val full = DeltaRead.read(spark, root)
    val pruned = DeltaRead.readBetween(spark, root, "id", 10L, 20L)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"expected fewer than ${full.inputFiles.length} files planned")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet ==
      (10L to 20L).toSet)
    // string-stats skipping, and open bounds
    val prunedS = DeltaRead.readBetween(spark, root, "s", "s090", null)
    assert(prunedS.inputFiles.length < full.inputFiles.length)
    assert(prunedS.count() == 10L)
    assert(DeltaRead.readBetween(spark, root, "id", null, 3L)
      .count() == 4L)
  }

  test("GraftTable round-trip: import of an engine-written Delta table " +
      "is snapshot-equal") {
    val root = fresh()
    val gt = fresh() + "/gt"
    DeltaWrite.create(spark, df3, root, partitionBy = Seq("p"))
    GraftTable.importDelta(spark, root, gt, key = "id")
    val a = GraftTable.read(spark, gt).select("id", "v", "p")
      .collect().map(_.toSeq).toSet
    val b = df3.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
