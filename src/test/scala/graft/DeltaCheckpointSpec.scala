package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.{DeltaDv, DeltaRead, RoaringBitmapArray}

/** The two checkpoint forms beyond the classic single-part one — both
  * hand-authored per PROTOCOL.md ("Checkpoints"): classic MULTI-PART
  * (`<v>.checkpoint.<i>.<n>.parquet`, the parts partitioning one
  * logical checkpoint's rows; incomplete part sets refuse by name) and
  * V2 (`<v>.checkpoint.<uuid>.parquet|json` manifests carrying
  * checkpointMetadata + sidecar actions, with file actions inline or
  * in `_delta_log/_sidecars/` parquet files). Each scenario VACUUMS
  * the pre-checkpoint JSON commits, so passing proves the bootstrap
  * actually consumed the checkpoint bytes — there is nothing else to
  * read. */
class DeltaCheckpointSpec extends SparkSpec {

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def freshTable(): String =
    Files.createTempDirectory("graft_cp_").toString

  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    val dest = Paths.get(root, name)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
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

  private def metaLine(schemaJson: String) =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},"partitionColumns":[],""" +
      s""""configuration":{},"createdTime":0}}"""

  private def addLine(path: String) =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  private def removeLine(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  // ---- checkpoint-row schemas (the subset these fixtures carry) ----

  private val protoT = StructType(Seq(
    StructField("minReaderVersion", IntegerType),
    StructField("minWriterVersion", IntegerType),
    StructField("readerFeatures", ArrayType(StringType))))
  private val metaT = StructType(Seq(
    StructField("id", StringType),
    StructField("format", StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))),
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType)),
    StructField("configuration", MapType(StringType, StringType)),
    StructField("createdTime", LongType)))
  private val dvT = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", LongType),
    StructField("sizeInBytes", LongType),
    StructField("cardinality", LongType)))
  private val addT = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("dataChange", BooleanType),
    StructField("stats", StringType),
    StructField("deletionVector", dvT)))
  private val sidecarT = StructType(Seq(
    StructField("path", StringType),
    StructField("sizeInBytes", LongType),
    StructField("modificationTime", LongType)))
  private val cpMetaT = StructType(Seq(StructField("version", LongType)))

  private def protoRow(minR: Int, minW: Int, features: Seq[String]) =
    Row(minR, minW, if (features.isEmpty) null else features)
  private def metaRow(schemaJson: String) =
    Row("fixture", Row("parquet", Map.empty[String, String]), schemaJson,
      Seq.empty[String], Map.empty[String, String], 0L)
  private def addRow(path: String, dv: Option[DeltaDv.DvDescriptor] = None) =
    Row(path, Map.empty[String, String], 1L, 0L, true, null,
      dv.map(d => Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(Long.box).orNull, d.sizeInBytes.toLong,
        d.cardinality)).orNull)

  private def writeRows(root: String, name: String, schema: StructType,
                        rows: Seq[Row]): Unit =
    dataFile(root, name,
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))

  test("multi-part checkpoint: parts read as one; incomplete sets refuse by name") {
    import spark.implicits._
    val root = freshTable()
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    (1 to 3).foreach(i =>
      dataFile(root, s"f$i.parquet", Seq((i.toLong, s"p$i")).toDF("id", "v")))
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(schema.json), addLine("f1.parquet"), addLine("f2.parquet")))
    writeCommit(root, 1, Seq(addLine("f3.parquet")))

    // the v1 checkpoint, split across two parts: protocol+metaData in
    // part 1, the three adds in part 2
    val cpT = StructType(Seq(StructField("protocol", protoT),
      StructField("metaData", metaT), StructField("add", addT)))
    writeRows(root, "_delta_log/00000000000000000001.checkpoint.0000000001.0000000002.parquet",
      cpT, Seq(Row(protoRow(1, 2, Nil), null, null),
        Row(null, metaRow(schema.json), null)))
    writeRows(root, "_delta_log/00000000000000000001.checkpoint.0000000002.0000000002.parquet",
      cpT, (1 to 3).map(i => Row(null, null, addRow(s"f$i.parquet"))))

    // vacuum the JSON commits the checkpoint covers — the bootstrap
    // must now come entirely from the parts
    Files.delete(Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(root, "_delta_log", f"${1L}%020d.json"))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L, 3L))
    assert(DeltaRead.latestVersion(root) === 1L)

    // the tail still applies on top
    writeCommit(root, 2, Seq(removeLine("f1.parquet")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(2L, 3L))

    // drop part 2 of 2: the checkpoint is unusable, the log has a gap,
    // and the refusal names the incomplete part set
    Files.delete(Paths.get(root,
      "_delta_log/00000000000000000001.checkpoint.0000000002.0000000002.parquet"))
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e.getMessage.contains("incomplete") &&
      e.getMessage.contains("1 of 2 parts"))
  }

  test("v2 checkpoint (parquet manifest): sidecar file actions, DVs included") {
    import spark.implicits._
    val root = freshTable()
    val log = s"$root/_delta_log"
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    dataFile(root, "f1.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    dataFile(root, "f2.parquet", Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
    // f2's row 0 (id=3) is deleted — the DV descriptor must survive
    // the SIDECAR hop, not just the JSON fold
    val Seq(dv) = DeltaDv.writeFile(root, "", Seq(RoaringBitmapArray(0L)))

    writeRows(root, "_delta_log/_sidecars/sc1.parquet",
      StructType(Seq(StructField("add", addT))),
      Seq(Row(addRow("f1.parquet"))))
    writeRows(root, "_delta_log/_sidecars/sc2.parquet",
      StructType(Seq(StructField("add", addT))),
      Seq(Row(addRow("f2.parquet", Some(dv)))))

    val mfT = StructType(Seq(StructField("protocol", protoT),
      StructField("metaData", metaT),
      StructField("checkpointMetadata", cpMetaT),
      StructField("sidecar", sidecarT)))
    val scSize = (n: String) => Files.size(Paths.get(log, "_sidecars", n))
    writeRows(root,
      s"_delta_log/00000000000000000000.checkpoint.${UUID.randomUUID()}.parquet",
      mfT, Seq(
        Row(protoRow(3, 7, Seq("deletionVectors", "v2Checkpoint")), null, null, null),
        Row(null, metaRow(schema.json), null, null),
        Row(null, null, Row(0L), null),
        Row(null, null, null, Row("sc1.parquet", scSize("sc1.parquet"), 0L)),
        Row(null, null, null, Row("sc2.parquet", scSize("sc2.parquet"), 0L))))

    // no JSON commit exists at all — the v2 checkpoint IS version 0
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L, 4L))
    assert(DeltaRead.latestVersion(root) === 0L)

    // the tail still applies on top of the sidecar bootstrap
    dataFile(root, "f3.parquet", Seq((5L, "e")).toDF("id", "v"))
    writeCommit(root, 1, Seq(addLine("f3.parquet")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L, 4L, 5L))
  }

  test("v2 checkpoint (json manifest): inline file actions; tombstones ignored") {
    import spark.implicits._
    val root = freshTable()
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    dataFile(root, "f1.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(schema.json),
      """{"checkpointMetadata":{"version":0}}""",
      addLine("f1.parquet"),
      // an expired tombstone retained for vacuum — never state
      removeLine("f9.parquet"))
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.write(Paths.get(root,
      s"_delta_log/00000000000000000000.checkpoint.${UUID.randomUUID()}.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L))
  }

  test("v2 checkpoint whose checkpointMetadata claims the wrong version refuses") {
    import spark.implicits._
    val root = freshTable()
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    dataFile(root, "f1.parquet", Seq((1L, "a")).toDF("id", "v"))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(schema.json),
      """{"checkpointMetadata":{"version":7}}""", // forged / mis-renamed
      addLine("f1.parquet"))
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.write(Paths.get(root,
      s"_delta_log/00000000000000000000.checkpoint.${UUID.randomUUID()}.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e.getMessage.contains("does not claim its own version"))
  }

  test("form preference: at one version the classic single-part wins; a newer v2 wins over both") {
    import spark.implicits._
    val root = freshTable()
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    (1 to 2).foreach(i =>
      dataFile(root, s"f$i.parquet", Seq((i.toLong, s"p$i")).toDF("id", "v")))
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(schema.json), addLine("f1.parquet")))

    // v0 classic single-part checkpoint
    val cpT = StructType(Seq(StructField("protocol", protoT),
      StructField("metaData", metaT), StructField("add", addT)))
    writeRows(root, "_delta_log/00000000000000000000.checkpoint.parquet",
      cpT, Seq(Row(protoRow(1, 2, Nil), null, null),
        Row(null, metaRow(schema.json), null),
        Row(null, null, addRow("f1.parquet"))))
    Files.delete(Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L))

    // a NEWER v2 checkpoint at version 1 (f2 joined) — version beats form
    writeCommit(root, 1, Seq(addLine("f2.parquet")))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(schema.json),
      """{"checkpointMetadata":{"version":1}}""",
      addLine("f1.parquet"), addLine("f2.parquet"))
    Files.write(Paths.get(root,
      s"_delta_log/00000000000000000001.checkpoint.${UUID.randomUUID()}.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.delete(Paths.get(root, "_delta_log", f"${1L}%020d.json"))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L))
    assert(DeltaRead.latestVersion(root) === 1L)
  }
}
