package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{MetadataBuilder, StructType}

import graft.sources.{GraftTable, IcebergRead}

/** Incremental Iceberg→GraftTable CDC sync — [[GraftTable.syncIceberg]],
  * the snapshot-ancestry twin of DeltaSyncSpec: a live Iceberg writer
  * keeps committing snapshots and the synced table must stay
  * snapshot-equal at EVERY rung of the ancestry chain (appends,
  * copy-on-write file replacement, whole-file deletes, re-adds),
  * crash-idempotent via the marker protocol, with loud refusals for
  * non-ancestor markers (rollback/branch rewrite), schema changes
  * (renames included), and the reader's own delete-manifest guards. */
class IcebergSyncSpec extends SparkSpec {

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int","default":0}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"content","type":"int","default":0},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"}]}}]}""".stripMargin)

  private def avroWrite(path: String, schema: Schema,
                        rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def mlRow(path: String): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("content", 0)
    r
  }

  private def mRow(status: Int, filePath: String): GenericRecord = {
    val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
    df.put("content", 0); df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    val r = new GenericData.Record(manifestSchema)
    r.put("status", status); r.put("data_file", df)
    r
  }

  private def withIds(df: DataFrame): DataFrame = {
    val ids = Map("id" -> 1L, "v" -> 2L)
    df.sparkSession.createDataFrame(df.rdd,
      StructType(df.schema.fields.map(f => f.copy(metadata =
        new MetadataBuilder().putLong("parquet.field.id", ids(f.name)).build()))))
  }

  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    withIds(df).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.createDirectories(Paths.get(root, "data"))
    Files.move(part, Paths.get(root, "data", name),
      StandardCopyOption.REPLACE_EXISTING)
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  private val schema0 =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}]}""".stripMargin
  private val schema1 = // rename v -> w, same field id
    """{"type":"struct","schema-id":1,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"w","required":false,"type":"string"}]}""".stripMargin

  /** Writes a manifest + manifest list for `files` as snapshot `sid`. */
  private def writeSnap(root: String, sid: Long, files: Seq[String]): Unit = {
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    avroWrite(md.resolve(s"m$sid.avro").toString, manifestSchema,
      files.map(f => mRow(1, s"data/$f")))
    avroWrite(md.resolve(s"snap-$sid.avro").toString, manifestListSchema,
      Seq(mlRow(s"metadata/m$sid.avro")))
  }

  private def snapJson(sid: Long, parent: Option[Long],
                       schemaId: Int = 0): String =
    s"""{"snapshot-id":$sid,${parent.map(p => s""""parent-snapshot-id":$p,""").getOrElse("")}""" +
      s""""schema-id":$schemaId,"manifest-list":"metadata/snap-$sid.avro"}"""

  private def writeMeta(root: String, version: Int, current: Long,
                        snaps: Seq[String]): Unit = {
    val md = Paths.get(root, "metadata")
    Files.writeString(md.resolve(s"v$version.metadata.json"),
      s"""{"format-version":2,"table-uuid":"sync","location":"$root",
         |"current-snapshot-id":$current,
         |"schemas":[$schema0,$schema1],"current-schema-id":0,
         |"snapshots":[${snaps.mkString(",")}]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), version.toString)
  }

  private def assertMirrors(gt: String, iceRoot: String, sid: Long): Unit = {
    val want = IcebergRead.read(spark, iceRoot, sid)
    val got = GraftTable.read(spark, gt)
    assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty,
      s"GraftTable diverged from Iceberg snapshot $sid")
  }

  test("sync walks snapshot ancestry: update, append, delete, re-add") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_isync_").toString
    val gt = Files.createTempDirectory("graft_isync_gt_").toString

    // snap 1: f1 = {1,2,3}
    dataFile(root, "f1.parquet",
      Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("id", "v"))
    writeSnap(root, 1, Seq("f1.parquet"))
    writeMeta(root, 1, 1, Seq(snapJson(1, None)))
    GraftTable.importIceberg(spark, root, gt, "id", 2)
    assert(GraftTable.icebergSyncState(gt) === Some((root, 1L)))
    assertMirrors(gt, root, 1)

    // snap 2 (parent 1): CoW replace f1 -> f1b (1 changed, 2 kept,
    // 3 dropped) + append f2 = {4}
    dataFile(root, "f1b.parquet", Seq((1L, "B1"), (2L, "a2")).toDF("id", "v"))
    dataFile(root, "f2.parquet", Seq((4L, "c4")).toDF("id", "v"))
    writeSnap(root, 2, Seq("f1b.parquet", "f2.parquet"))
    // snap 3 (parent 2): whole-file delete of f1b
    writeSnap(root, 3, Seq("f2.parquet"))
    // snap 4 (parent 3): re-add f1 (original rows return)
    writeSnap(root, 4, Seq("f2.parquet", "f1.parquet"))
    writeMeta(root, 2, 4, Seq(snapJson(1, None), snapJson(2, Some(1)),
      snapJson(3, Some(2)), snapJson(4, Some(3))))

    val applied = GraftTable.syncIceberg(spark, gt)
    assert(applied.map(_._1) === Seq(2L, 3L, 4L))
    assert(GraftTable.icebergSyncState(gt) === Some((root, 4L)))
    assertMirrors(gt, root, 4)
    // snapshot-equal at EVERY rung via GraftTable time travel
    (1 to 4).foreach { sid =>
      val want = IcebergRead.read(spark, root, sid.toLong)
      val got = GraftTable.read(spark, gt, sid)
      assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty,
        s"GraftTable version $sid != Iceberg snapshot $sid")
    }
    // no-op re-sync
    assert(GraftTable.syncIceberg(spark, gt).isEmpty)

    // crash-replay idempotence: marker lost the race with the last merge
    Files.writeString(Paths.get(gt, "iceberg_sync.json"),
      s"""{"icebergRoot":"$root","snapshotId":3}""")
    val reapplied = GraftTable.syncIceberg(spark, gt)
    assert(reapplied.map(_._1) === Seq(4L))
    assertMirrors(gt, root, 4)
  }

  test("refuses non-ancestor markers, schema changes, and rolled lineages") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_isyncr_").toString
    val gt = Files.createTempDirectory("graft_isyncr_gt_").toString
    dataFile(root, "f1.parquet", Seq((1L, "a1")).toDF("id", "v"))
    writeSnap(root, 1, Seq("f1.parquet"))
    writeMeta(root, 1, 1, Seq(snapJson(1, None)))
    GraftTable.importIceberg(spark, root, gt, "id", 1)

    // schema change mid-stream: snap 2 renames v -> w (same field id)
    // — correct to READ, but the sync has no rename story and must
    // refuse rather than silently write under the old column name
    dataFile(root, "f2.parquet", Seq((2L, "b2")).toDF("id", "v"))
    writeSnap(root, 2, Seq("f1.parquet", "f2.parquet"))
    writeMeta(root, 2, 2, Seq(snapJson(1, None), snapJson(2, Some(1), schemaId = 1)))
    val e = intercept[IllegalArgumentException] { GraftTable.syncIceberg(spark, gt) }
    assert(e.getMessage.contains("changes the table schema"))
    assertMirrors(gt, root, 1)

    // rolled/replaced lineage: current snapshot whose ancestry does NOT
    // contain the marker — refuse instead of diffing across a rewrite
    writeSnap(root, 9, Seq("f2.parquet"))
    writeMeta(root, 3, 9, Seq(snapJson(9, None)))
    val e2 = intercept[IllegalArgumentException] { GraftTable.syncIceberg(spark, gt) }
    assert(e2.getMessage.contains("not an ancestor"))
    // marker untouched — nothing was applied
    assert(GraftTable.icebergSyncState(gt) === Some((root, 1L)))
  }
}
