package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.sources.{GraftTable, IcebergRead}

/** Iceberg v2 ROW-LEVEL DELETES, proven against hand-authored tables
  * (spec §Row-level deletes): position delete files ((file_path, pos)
  * parquet rows dropping physical positions), equality delete files
  * (null-safe matches on the `equality_ids` columns), and the
  * sequence-number applicability rules — position deletes hit data
  * files with data sequence number ≤ theirs, equality deletes only
  * STRICTLY older ones, so a write's own rows stay visible. Plus the
  * loud refusals: equality deletes on a partitioned table, equality
  * ids resolving to no top-level field, and the incremental
  * [[GraftTable.syncIceberg]] application of both delete kinds. */
class IcebergDeleteSpec extends SparkSpec {

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":"long","default":0}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"content","type":"int","default":0},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
      |]}}]}""".stripMargin)

  private def avroWrite(path: String, schema: Schema,
                        rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def mlRow(path: String, content: Int, seq: Long): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("content", content)
    r.put("sequence_number", seq)
    r
  }

  private def entryRow(status: Int, filePath: String, content: Int = 0,
                       seq: Option[Long] = None,
                       eqIds: Seq[Int] = Nil): GenericRecord = {
    val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
    df.put("content", content); df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("equality_ids",
      if (eqIds.isEmpty) null else eqIds.map(Int.box).asJava)
    val r = new GenericData.Record(manifestSchema)
    r.put("status", status)
    r.put("sequence_number", seq.map(Long.box).orNull)
    r.put("data_file", df)
    r
  }

  private def withIds(df: DataFrame, ids: Map[String, Long]): DataFrame = {
    val fields = df.schema.fields.map(f => ids.get(f.name).map(id =>
      f.copy(metadata = new MetadataBuilder()
        .putLong("parquet.field.id", id).build())).getOrElse(f))
    df.sparkSession.createDataFrame(df.rdd, StructType(fields))
  }

  /** Writes `df` as ONE parquet file at `<root>/data/<name>`, rows in
    * df order (positions are physical). */
  private def dataFile(root: String, name: String, df: DataFrame): String = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.createDirectories(Paths.get(root, "data"))
    val dest = Paths.get(root, "data", name)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk.close()
    dest.toString
  }

  private val schemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}]}""".stripMargin

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  /** The full-surface fixture. Data files and sequence numbers:
    *   f1 seq 1: (1,a)(2,b)(3,c)(4,null)   f2 seq 1: (5,b)(6,e)
    *   f3 seq 3: (7,g)                     f4 seq 2: (8,b)
    * Deletes, all at seq 2:
    *   position: (f1,1)(f2,0) apply; (f3,0) must NOT (f3 is newer)
    *   equality on v: 'b' and NULL apply to seq-1 files only (strict <)
    * Expected current read: 1,3 (f1) + 6 (f2) + 7 (f3, pos-gated) +
    * 8 (f4, eq-gated). Snapshot 1 (pre-delete): 1..6. */
  private def buildTable(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ice_del_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    val fid = Map("id" -> 1L, "v" -> 2L)
    val f1 = dataFile(root, "f1.parquet", withIds(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null)).toDF("id", "v"), fid))
    val f2 = dataFile(root, "f2.parquet", withIds(
      Seq((5L, "b"), (6L, "e")).toDF("id", "v"), fid))
    val f3 = dataFile(root, "f3.parquet", withIds(
      Seq((7L, "g")).toDF("id", "v"), fid))
    dataFile(root, "f4.parquet", withIds(
      Seq((8L, "b")).toDF("id", "v"), fid))

    dataFile(root, "posdel.parquet",
      Seq((f1, 1L), (f2, 0L), (f3, 0L)).toDF("file_path", "pos"))
    dataFile(root, "eqdel.parquet", withIds(
      Seq(Some("b"), None).map(Tuple1(_)).toDF("v"), Map("v" -> 2L)))

    avroWrite(md.resolve("m1.avro").toString, manifestSchema, Seq(
      entryRow(1, "data/f1.parquet"), // seq inherited from the ml entry
      entryRow(1, "data/f2.parquet")))
    avroWrite(md.resolve("m2.avro").toString, manifestSchema, Seq(
      entryRow(1, "data/f3.parquet", seq = Some(3L)),
      entryRow(1, "data/f4.parquet", seq = Some(2L))))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema, Seq(
      entryRow(1, "data/posdel.parquet", content = 1),
      entryRow(1, "data/eqdel.parquet", content = 2, eqIds = Seq(2))))
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema,
      Seq(mlRow("metadata/m1.avro", 0, 1L)))
    avroWrite(md.resolve("snap-2.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/m2.avro", 0, 3L),
      mlRow("metadata/mdel.avro", 1, 2L)))

    Files.writeString(md.resolve("v3.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"},
         |{"snapshot-id":2,"schema-id":0,"parent-snapshot-id":1,"manifest-list":"metadata/snap-2.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "3")
    root
  }

  test("position + equality deletes apply under the sequence rules") {
    val root = buildTable()
    val got = IcebergRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "v"))
    // f1 keeps (1,a)(3,c): pos (f1,1) dropped id 2, eq NULL-match
    // dropped id 4; f2 keeps 6 (pos dropped 5); f3 keeps 7 (the
    // pos-delete at seq 2 does not reach a seq-3 file); f4 keeps 8
    // (equality is strictly-older-only)
    assert(ids(got) === Seq(1L, 3L, 6L, 7L, 8L))
    assert(got.where(org.apache.spark.sql.functions.col("v") === "b").count() === 1L) // id 8
    // pre-delete snapshot still reads whole
    assert(ids(IcebergRead.read(spark, root, snapshotId = 1L)) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("importIceberg of a delete-carrying snapshot applies the deletes") {
    val root = buildTable()
    val gt = Files.createTempDirectory("graft_ice_del_gt_").toString
    GraftTable.importIceberg(spark, root, gt, "id", 2)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L, 3L, 6L, 7L, 8L))
  }

  test("syncIceberg applies position AND equality delete commits incrementally") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ice_del_sync_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    val fid = Map("id" -> 1L, "v" -> 2L)
    val f1 = dataFile(root, "f1.parquet", withIds(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), fid))
    avroWrite(md.resolve("m1.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/f1.parquet")))
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema,
      Seq(mlRow("metadata/m1.avro", 0, 1L)))
    def metaJson(v: Int, snaps: String): Unit = {
      Files.writeString(md.resolve(s"v$v.metadata.json"),
        s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
           |"current-snapshot-id":${v},
           |"schemas":[$schemaJson],"current-schema-id":0,
           |"snapshots":[$snaps]}""".stripMargin)
      Files.writeString(md.resolve("version-hint.text"), v.toString)
    }
    val snap1 =
      s"""{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"}"""
    metaJson(1, snap1)

    val gt = Files.createTempDirectory("graft_ice_del_sync_gt_").toString
    GraftTable.importIceberg(spark, root, gt, "id", 2)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L, 2L, 3L))

    // snapshot 2: a position delete hides f1's row 0 (id=1) — the
    // data-file set is UNCHANGED, only visibility moved
    dataFile(root, "posdel.parquet", Seq((f1, 0L)).toDF("file_path", "pos"))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/posdel.parquet", content = 1)))
    avroWrite(md.resolve("snap-2.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel.avro", 1, 2L)))
    val snap2 = snap1 + "," +
      s"""{"snapshot-id":2,"schema-id":0,"parent-snapshot-id":1,"manifest-list":"metadata/snap-2.avro"}"""
    metaJson(2, snap2)
    val applied = GraftTable.syncIceberg(spark, gt)
    assert(applied.map(_._1) === Seq(2L))
    assert(applied.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq(2L, 3L))

    // snapshot 3: a SECOND delete file hides row 1 (id=2) — the diff
    // must localize to the new delete file's targets only
    dataFile(root, "posdel2.parquet", Seq((f1, 1L)).toDF("file_path", "pos"))
    avroWrite(md.resolve("mdel2.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/posdel2.parquet", content = 1)))
    avroWrite(md.resolve("snap-3.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel.avro", 1, 2L),
      mlRow("metadata/mdel2.avro", 1, 3L)))
    val snap3 = snap2 + "," +
      s"""{"snapshot-id":3,"schema-id":0,"parent-snapshot-id":2,"manifest-list":"metadata/snap-3.avro"}"""
    metaJson(3, snap3)
    val applied3 = GraftTable.syncIceberg(spark, gt)
    assert(applied3.map(_._1) === Seq(3L))
    assert(applied3.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq(3L))

    // snapshot 4: an EQUALITY delete (v='c' → id 3) lands
    // incrementally too (r15): the eq-applicable common files ride
    // both sides of the diff, so the newly hidden key falls out as a
    // delete — no re-import
    dataFile(root, "eqdel2.parquet", withIds(
      Seq(Tuple1("c")).toDF("v"), Map("v" -> 2L)))
    avroWrite(md.resolve("mdel3.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/eqdel2.parquet", content = 2, eqIds = Seq(2))))
    avroWrite(md.resolve("snap-4.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel.avro", 1, 2L),
      mlRow("metadata/mdel2.avro", 1, 3L),
      mlRow("metadata/mdel3.avro", 1, 4L)))
    val snap4 = snap3 + "," +
      s"""{"snapshot-id":4,"schema-id":0,"parent-snapshot-id":3,"manifest-list":"metadata/snap-4.avro"}"""
    metaJson(4, snap4)
    val applied4 = GraftTable.syncIceberg(spark, gt)
    assert(applied4.map(_._1) === Seq(4L))
    assert(applied4.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq.empty)
    assert(ids(IcebergRead.read(spark, root)) === Seq.empty)

    // snapshot 5: the equality delete file is DROPPED — id 3
    // resurrects as an upsert through the same eq-applicable diff
    avroWrite(md.resolve("snap-5.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel.avro", 1, 2L),
      mlRow("metadata/mdel2.avro", 1, 3L)))
    val snap5 = snap4 + "," +
      s"""{"snapshot-id":5,"schema-id":0,"parent-snapshot-id":4,"manifest-list":"metadata/snap-5.avro"}"""
    metaJson(5, snap5)
    val applied5 = GraftTable.syncIceberg(spark, gt)
    assert(applied5.map(_._1) === Seq(5L))
    assert(ids(GraftTable.read(spark, gt)) === Seq(3L))
    assert(ids(IcebergRead.read(spark, root)) === Seq(3L))

    // readChanges surfaces the equality-delete visibility moves too
    // (r15): the new eq file at snap 4 deletes id 3, dropping it at
    // snap 5 resurrects it as an insert
    val feed = IcebergRead.readChanges(spark, root, 3L, 5L)
      .select("_commit_snapshot_id", "_change_type", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(feed === Seq((4L, "delete", 3L), (5L, "insert", 3L)))
  }

  test("readChanges: per-snapshot feed with survivor cancellation and visibility-only commits") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ice_cdf_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    val fid = Map("id" -> 1L, "v" -> 2L)
    val f1 = dataFile(root, "f1.parquet", withIds(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), fid))
    dataFile(root, "f2.parquet", withIds(
      Seq((4L, "d"), (5L, "e")).toDF("id", "v"), fid))
    dataFile(root, "f1b.parquet", withIds(
      Seq((3L, "c")).toDF("id", "v"), fid)) // CoW rewrite: id 2 dropped
    dataFile(root, "posdel.parquet", Seq((f1, 0L)).toDF("file_path", "pos"))

    avroWrite(md.resolve("m1.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/f1.parquet")))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/posdel.parquet", content = 1)))
    avroWrite(md.resolve("m3.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/f2.parquet", seq = Some(3L))))
    avroWrite(md.resolve("m4.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/f1b.parquet", seq = Some(4L))))
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema,
      Seq(mlRow("metadata/m1.avro", 0, 1L)))
    avroWrite(md.resolve("snap-2.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L), mlRow("metadata/mdel.avro", 1, 2L)))
    avroWrite(md.resolve("snap-3.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L), mlRow("metadata/mdel.avro", 1, 2L),
      mlRow("metadata/m3.avro", 0, 3L)))
    avroWrite(md.resolve("snap-4.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m4.avro", 0, 4L), mlRow("metadata/m3.avro", 0, 3L)))
    Files.writeString(md.resolve("v4.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":4,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"},
         |{"snapshot-id":2,"schema-id":0,"parent-snapshot-id":1,"manifest-list":"metadata/snap-2.avro"},
         |{"snapshot-id":3,"schema-id":0,"parent-snapshot-id":2,"manifest-list":"metadata/snap-3.avro"},
         |{"snapshot-id":4,"schema-id":0,"parent-snapshot-id":3,"manifest-list":"metadata/snap-4.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "4")

    def feed(from: Long, to: Long): Seq[(Long, String, Long)] =
      IcebergRead.readChanges(spark, root, from, to)
        .select("_commit_snapshot_id", "_change_type", "id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    // snap2: visibility-only — exactly the newly hidden row
    assert(feed(1, 2) === Seq((2L, "delete", 1L)))
    // snap3: plain append
    assert(feed(2, 3) === Seq((3L, "insert", 4L), (3L, "insert", 5L)))
    // snap4: CoW rewrite of f1 — the SURVIVOR (id 3) cancels, only the
    // dropped row surfaces
    assert(feed(3, 4) === Seq((4L, "delete", 2L)))
    assert(feed(1, 4) === Seq((2L, "delete", 1L), (3L, "insert", 4L),
      (3L, "insert", 5L), (4L, "delete", 2L)))
    // an empty range is an empty frame with the feed schema
    val empty = IcebergRead.readChanges(spark, root, 2, 2)
    assert(empty.columns.toSeq ===
      Seq("id", "v", "_change_type", "_commit_snapshot_id"))
    assert(empty.count() === 0L)
    // a non-ancestor pair refuses
    val e = intercept[IllegalArgumentException] {
      IcebergRead.readChanges(spark, root, 3, 2)
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("equality deletes on a partitioned table refuse") {
    import spark.implicits._
    val root = buildTable()
    val md = Paths.get(root, "metadata")
    Files.writeString(md.resolve("v4.metadata.json"),
      Files.readString(md.resolve("v3.metadata.json")).replace(
        s""""current-snapshot-id":2,""",
        s""""current-snapshot-id":2,
           |"partition-specs":[{"spec-id":0,"fields":[
           |{"name":"v","transform":"identity","source-id":2,"field-id":1000}]}],
           |""".stripMargin))
    Files.writeString(md.resolve("version-hint.text"), "4")
    val e = intercept[IllegalArgumentException] { IcebergRead.read(spark, root) }
    assert(e.getMessage.contains("PARTITIONED"))
  }

  test("deletes apply in a table path containing URI-escapable characters") {
    // ADVICE r14: _metadata.file_path is a URL-encoded URI while
    // manifest/delete-file paths are raw — before the canonicalization
    // percent-decoded both sides, a path with a space silently emptied
    // every delete-aware inner join (wrong data, no error)
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ice_sp_")
    val root = Files.createDirectory(base.resolve("ice tbl")).toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    val fid = Map("id" -> 1L, "v" -> 2L)
    val f1 = dataFile(root, "f1.parquet", withIds(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), fid))
    dataFile(root, "posdel.parquet",
      Seq((f1, 1L)).toDF("file_path", "pos"))
    avroWrite(md.resolve("m1.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/f1.parquet")))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema,
      Seq(entryRow(1, "data/posdel.parquet", content = 1)))
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel.avro", 1, 2L)))
    Files.writeString(md.resolve("v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":1,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "1")
    assert(ids(IcebergRead.read(spark, root)) === Seq(1L, 3L))
  }

  test("an equality id with no top-level schema field refuses") {
    val root = buildTable()
    val md = Paths.get(root, "metadata")
    avroWrite(md.resolve("mdel99.avro").toString, manifestSchema, Seq(
      entryRow(1, "data/eqdel.parquet", content = 2, eqIds = Seq(99))))
    avroWrite(md.resolve("snap-3.avro").toString, manifestListSchema, Seq(
      mlRow("metadata/m1.avro", 0, 1L),
      mlRow("metadata/mdel99.avro", 1, 2L)))
    Files.writeString(md.resolve("v5.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":3,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":3,"schema-id":0,"manifest-list":"metadata/snap-3.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "5")
    val e = intercept[RuntimeException] { IcebergRead.read(spark, root) }
    assert(e.getMessage.contains("field id 99"))
  }
}
