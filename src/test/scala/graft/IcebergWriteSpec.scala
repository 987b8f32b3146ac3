package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.DataFrame

import graft.sources.{GraftTable, IcebergRead, IcebergWrite}
import graft.util.Json

/** Write-side Iceberg interop — the same three-way validation story as
  * DeltaWriteSpec: golden assertions on the metadata JSON and manifest
  * avro the writer emits (field ids, spec-mandated counts), round-trip
  * through the independently-pinned [[IcebergRead]] — which resolves
  * columns BY FIELD ID and refuses id-less parquet, so a passing read
  * also proves the writer stamped ids into every data file footer —
  * and the refusal surface. IcebergWriteProps adds the random-sequence
  * model property. */
class IcebergWriteSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_icew_").toString

  private def df3: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
  }

  private def metaJson(root: String, v: Int): Any =
    Json.parse(Files.readString(
      Paths.get(root, "metadata", s"v$v.metadata.json")))

  private def avro(path: String): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try r.iterator.asScala.toVector finally r.close()
  }

  test("create writes spec-shaped v2 metadata: schema ids, spec, snapshot") {
    val root = fresh()
    val snapId = IcebergWrite.create(spark, df3, root)
    val meta = metaJson(root, 1)
    assert(Json.long(meta, "format-version").contains(2L))
    assert(Json.str(meta, "table-uuid").exists(_.nonEmpty))
    assert(Json.long(meta, "last-column-id").contains(3L))
    assert(Json.long(meta, "current-snapshot-id").contains(snapId))
    assert(Json.long(meta, "last-sequence-number").contains(1L))

    val schema = Json.list(meta, "schemas").head
    val fields = Json.list(schema, "fields")
    assert(fields.map(f => (Json.long(f, "id").get,
      Json.str(f, "name").get)) == List((1L, "id"), (2L, "v"), (3L, "n")))

    val spec = Json.list(meta, "partition-specs").head
    assert(Json.list(spec, "fields").isEmpty, "unpartitioned spec")

    val snap = Json.list(meta, "snapshots").head
    assert(Json.long(snap, "snapshot-id").contains(snapId))
    assert(Json.str(snap, "summary", "operation").contains("append"))

    // manifest list → manifest → data files, all fields spec-shaped
    val ml = avro(Json.str(snap, "manifest-list").get)
    assert(ml.size == 1)
    val row = ml.head
    assert(row.get("content").toString.toLong == 0L)
    assert(row.get("added_files_count").toString.toLong >= 1L)
    assert(row.get("added_rows_count").toString.toLong == 3L)
    val entries = avro(row.get("manifest_path").toString)
    assert(entries.forall(_.get("status").toString.toInt == 1))
    val dataFiles = entries.map(_.get("data_file").asInstanceOf[GenericRecord])
    assert(dataFiles.map(_.get("record_count").toString.toLong).sum == 3L)
    assert(dataFiles.forall(_.get("file_format").toString == "PARQUET"))
    assert(Files.exists(Paths.get(root, "metadata", "version-hint.text")))
  }

  test("round-trip through the field-id-resolving reader at every snapshot") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, df3, root)
    val s2 = IcebergWrite.append(spark,
      Seq((4L, "d", 40)).toDF("id", "v", "n"), root)
    val s3 = IcebergWrite.overwrite(spark,
      Seq((9L, "z", 90)).toDF("id", "v", "n"), root)

    def ids(snapId: Long) = IcebergRead.read(spark, root, snapId)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(1L) == Set(1L, 2L, 3L))
    assert(ids(s2) == Set(1L, 2L, 3L, 4L))
    assert(ids(s3) == Set(9L))
    assert(IcebergRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(9L))
    // parent ancestry recorded (what syncIceberg walks)
    val meta = metaJson(root, 3)
    val bySnap = Json.list(meta, "snapshots")
      .map(s => Json.long(s, "snapshot-id").get ->
        Json.long(s, "parent-snapshot-id")).toMap
    assert(bySnap(s2) == Some(1L) && bySnap(s3) == Some(s2))
  }

  test("append carries prior manifests by reference — work per commit " +
      "proportional to the commit") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, df3, root)
    val firstMl = {
      val meta = metaJson(root, 1)
      avro(Json.str(Json.list(meta, "snapshots").head, "manifest-list").get)
        .map(_.get("manifest_path").toString)
    }
    IcebergWrite.append(spark, Seq((4L, "d", 40)).toDF("id", "v", "n"), root)
    val meta2 = metaJson(root, 2)
    val snap2 = Json.list(meta2, "snapshots")
      .find(s => Json.long(s, "sequence-number").contains(2L)).get
    val ml2 = avro(Json.str(snap2, "manifest-list").get)
    assert(ml2.size == 2, "carried + new")
    // the prior manifest file itself is REUSED, not rewritten
    assert(ml2.map(_.get("manifest_path").toString).contains(firstMl.head))
    // carried row keeps its original sequence number
    val carried = ml2.find(_.get("manifest_path").toString == firstMl.head).get
    assert(carried.get("sequence_number").toString.toLong == 1L)
  }

  test("schema alignment and refusals: mismatch, partitioned table, " +
      "existing table") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, df3, root)
    // by-name reorder is fine
    IcebergWrite.append(spark, Seq((10, "e", 5L)).toDF("n", "v", "id"), root)
    assert(IcebergRead.read(spark, root).count() == 4)
    assert(intercept[Exception] {
      IcebergWrite.append(spark, Seq((6L, "f")).toDF("id", "v"), root)
    }.getMessage.contains("schema mismatch"))
    assert(intercept[Exception] {
      IcebergWrite.create(spark, df3, root)
    }.getMessage.contains("already exists"))

    // a hand-authored NON-IDENTITY-partitioned table refuses writes
    // (identity-partitioned tables WRITE since r15 —
    // IcebergPartitionedWriteSpec)
    val part = fresh()
    val metaDir = Paths.get(part, "metadata")
    Files.createDirectories(metaDir)
    Files.writeString(metaDir.resolve("v1.metadata.json"), Json.render(
      scala.collection.immutable.ListMap(
        "format-version" -> 2L, "table-uuid" -> "u", "location" -> part,
        "last-sequence-number" -> 0L, "last-updated-ms" -> 0L,
        "last-column-id" -> 1L, "current-schema-id" -> 0L,
        "schemas" -> List(scala.collection.immutable.ListMap(
          "type" -> "struct", "schema-id" -> 0L,
          "fields" -> List(scala.collection.immutable.ListMap(
            "id" -> 1L, "name" -> "id", "required" -> false,
            "type" -> "long")))),
        "default-spec-id" -> 0L,
        "partition-specs" -> List(scala.collection.immutable.ListMap(
          "spec-id" -> 0L,
          "fields" -> List(scala.collection.immutable.ListMap(
            "source-id" -> 1L, "field-id" -> 1000L,
            "transform" -> "truncate[4]", "name" -> "id_trunc")))),
        "last-partition-id" -> 1000L, "default-sort-order-id" -> 0L,
        "sort-orders" -> List(scala.collection.immutable.ListMap(
          "order-id" -> 0L, "fields" -> Nil)),
        "snapshots" -> Nil)))
    assert(intercept[Exception] {
      IcebergWrite.append(spark, Seq(1L).toDF("id"), part)
    }.getMessage.contains("identity"))
  }

  test("importIceberg round-trips an engine-written table into GraftTable") {
    val root = fresh()
    val gt = fresh() + "/gt"
    IcebergWrite.create(spark, df3, root)
    GraftTable.importIceberg(spark, root, gt, key = "id")
    assert(GraftTable.read(spark, gt).select("id", "v", "n")
      .collect().map(_.toSeq).toSet == df3.collect().map(_.toSeq).toSet)
  }

  test("exportIceberg: GraftTable → Iceberg → re-import, snapshot-equal") {
    val gt = fresh() + "/gt"
    val ice = fresh() + "/ice"
    val gt2 = fresh() + "/gt2"
    GraftTable.create(spark, gt, df3, "id", 2)
    GraftTable.exportIceberg(spark, gt, ice)
    assert(IcebergRead.read(spark, ice).select("id", "v", "n")
      .collect().map(_.toSeq).toSet == df3.collect().map(_.toSeq).toSet)
    GraftTable.importIceberg(spark, ice, gt2, key = "id")
    assert(GraftTable.read(spark, gt2).select("id", "v", "n")
      .collect().map(_.toSeq).toSet ==
      GraftTable.read(spark, gt).select("id", "v", "n")
        .collect().map(_.toSeq).toSet)
  }

  test("manifest + manifest-list avro carry the spec's key-value metadata") {
    import spark.implicits._
    val root = fresh()
    val s1 = IcebergWrite.create(spark, df3, root)
    val s2 = IcebergWrite.append(spark,
      Seq((4L, "d", 40)).toDF("id", "v", "n"), root)

    def avroMeta(path: String): Map[String, String] = {
      val r = new DataFileReader[GenericRecord](
        new java.io.File(path), new GenericDatumReader[GenericRecord]())
      try r.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
        .map(k => k -> r.getMetaString(k)).toMap
      finally r.close()
    }
    // conformant readers (Iceberg Java, PyIceberg) take the partition
    // spec + format version from this metadata — without it they
    // cannot open the table at all (ADVICE r13)
    Seq(s1, s2).foreach { sid =>
      val snap = Json.list(metaJson(root, sid.toInt), "snapshots")
        .find(s => Json.long(s, "snapshot-id").contains(sid)).get
      val mlPath = Json.str(snap, "manifest-list").get
      val mlMeta = avroMeta(mlPath)
      assert(mlMeta.get("format-version").contains("2"))
      assert(mlMeta.get("snapshot-id").contains(sid.toString))
      avro(mlPath).foreach { row =>
        val mMeta = avroMeta(row.get("manifest_path").toString)
        assert(mMeta.get("format-version").contains("2"))
        assert(mMeta.get("content").contains("data"))
        assert(mMeta.get("partition-spec").contains("[]"))
        assert(mMeta.get("partition-spec-id").contains("0"))
        assert(mMeta.get("schema-id").contains("0"))
        // schema metadata is the table's ACTUAL schema JSON
        val sch = Json.parse(mMeta("schema"))
        assert(Json.str(sch, "type").contains("struct"))
        assert(Json.list(sch, "fields").flatMap(Json.str(_, "name")) ==
          List("id", "v", "n"))
      }
    }
  }

  test("nested list/map field ids come from the main counter and " +
      "last-column-id bounds every id in the schema JSON") {
    import spark.implicits._
    val root = fresh()
    // id=1, tags(list)=2 element=3, attrs(map)=4 key=5 value=6 → last=6
    val df = Seq((1L, Seq("a", "b"), Map("k" -> 2L)))
      .toDF("id", "tags", "attrs")
    IcebergWrite.create(spark, df, root)
    val meta = metaJson(root, 1)
    val last = Json.long(meta, "last-column-id").get
    val schema = Json.list(meta, "schemas").head

    def allIds(t: Any): Seq[Long] = Json.str(t, "type") match {
      case Some("struct") => Json.list(t, "fields").flatMap { f =>
        Json.long(f, "id").get +: allIds(Json.get(f, "type")) }
      case Some("list") =>
        Json.long(t, "element-id").get +: allIds(Json.get(t, "element"))
      case Some("map") =>
        Seq(Json.long(t, "key-id").get, Json.long(t, "value-id").get) ++
          allIds(Json.get(t, "key")) ++ allIds(Json.get(t, "value"))
      case _ => Nil // scalar (type is the name string, not an object)
    }
    val ids = allIds(schema)
    assert(ids.sorted == (1L to last), // ADVICE r13: no anon-10000 ids,
      s"ids $ids must be exactly 1..$last") // no consumed-but-unseen ids
    assert(last == 6L)
    // and the table still round-trips through the field-id reader
    assert(IcebergRead.read(spark, root).select("id", "tags", "attrs")
      .collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  /** Top-level parquet footer field ids, null where absent. */
  private def footerIds(p: String): Seq[Option[Int]] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(f => Option(f.getId).map(_.intValue)).toSeq
    finally r.close()
  }

  test("position-delete writes: reserved-id delete file, delete manifest, " +
      "sequence rules, stacking (r15)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = fresh()
    IcebergWrite.create(spark, df3, root) // snap 1, seq 1
    def ids(): Seq[Long] = IcebergRead.read(spark, root)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

    // snap 2: hide id=2 — zero data bytes move
    val dataBefore = {
      val ls = Files.list(Paths.get(root, "data"))
      try ls.iterator().asScala.map(_.toString).toSet finally ls.close()
    }
    val s2 = IcebergWrite.delete(spark, root, col("id") === 2L)
    assert(s2 === 2L)
    assert(ids() === Seq(1L, 3L))
    assert(IcebergRead.read(spark, root, 1L).count() === 3L) // time travel
    val dataAfter = {
      val ls = Files.list(Paths.get(root, "data"))
      try ls.iterator().asScala.map(_.toString).toSet finally ls.close()
    }
    val newFiles = dataAfter -- dataBefore
    assert(dataBefore.subsetOf(dataAfter) && newFiles.size === 1,
      "exactly one delete file, no data file touched")

    // golden: the delete parquet carries the spec's reserved field ids
    // and sorted (file_path, pos) rows
    val delFile = newFiles.head
    assert(footerIds(delFile) === Seq(Some(2147483546), Some(2147483545)))
    val delRows = spark.read.parquet(delFile)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(delRows.size === 1 && delRows.head._2 >= 0L)
    assert(dataBefore.contains(delRows.head._1),
      "file_path must reference a live data file verbatim")
    assert(delRows === delRows.sorted)

    // golden: metadata v2 — snapshot op delete at seq 2; manifest list
    // carries the prior DATA manifest plus one DELETE manifest
    val meta = metaJson(root, 2)
    val snap2 = Json.list(meta, "snapshots")
      .find(s => Json.long(s, "snapshot-id").contains(2L)).get
    assert(Json.str(snap2, "summary", "operation").contains("delete"))
    assert(Json.long(snap2, "sequence-number").contains(2L))
    val mlRows = avro(Json.str(snap2, "manifest-list").get) // absolute
    assert(mlRows.map(_.get("content").toString.toLong).sorted === Seq(0L, 1L))
    val delManifest = mlRows.find(_.get("content").toString == "1").get
    assert(delManifest.get("sequence_number").toString.toLong === 2L)
    val delEntries = avro(delManifest.get("manifest_path").toString)
    assert(delEntries.size === 1)
    val delDf = delEntries.head.get("data_file")
      .asInstanceOf[GenericRecord]
    assert(delDf.get("content").toString.toLong === 1L)
    assert(delDf.get("record_count").toString.toLong === 1L)

    // sequence rule: re-append the same values — the OLD delete must
    // not hit the NEW file (write's own rows stay visible)
    IcebergWrite.append(spark, Seq((2L, "b", 20)).toDF("id", "v", "n"), root)
    assert(ids() === Seq(1L, 2L, 3L))

    // deletes STACK, and positions already hidden are never re-emitted
    val s4 = IcebergWrite.delete(spark, root, col("id").isin(1L, 2L))
    assert(s4 === 4L)
    assert(ids() === Seq(3L))
    // no-match delete commits nothing
    assert(IcebergWrite.delete(spark, root, col("id") === 99L) === s4)
    assert(Json.long(metaJson(root, 4), "current-snapshot-id").contains(s4))

    // and the graft import path applies the written deletes
    val gt = fresh() + "/gt"
    GraftTable.importIceberg(spark, root, gt, "id")
    assert(GraftTable.read(spark, gt).select("id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("equality-delete writes: keyed delete file, equality_ids, " +
      "strictly-older rule — the scan-free delete (r15)") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, df3, root) // snap 1: ids 1,2,3
    def ids(): Seq[Long] = IcebergRead.read(spark, root)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

    // snap 2: equality-delete ids 2 and 99 (99 matches nothing) —
    // no table scan, no data byte moves
    val dataBefore = {
      val ls = Files.list(Paths.get(root, "data"))
      try ls.iterator().asScala.map(_.toString).toSet finally ls.close()
    }
    val s2 = IcebergWrite.deleteEqual(spark, root, "id",
      Seq(2L, 99L).toDF("id"))
    assert(s2 === 2L)
    assert(ids() === Seq(1L, 3L))
    assert(IcebergRead.read(spark, root, 1L).count() === 3L) // time travel
    val newFiles = {
      val ls = Files.list(Paths.get(root, "data"))
      try ls.iterator().asScala.map(_.toString).toSet finally ls.close()
    } -- dataBefore
    assert(newFiles.size === 1)

    // golden: the delete parquet carries the schema field's id and
    // the sorted distinct keys
    assert(footerIds(newFiles.head) === Seq(Some(1)))
    assert(spark.read.parquet(newFiles.head).collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 99L))

    // golden: manifest-list content=1 (deletes), entry content=2
    // (equality) with equality_ids = [1]
    val meta = metaJson(root, 2)
    val snap2 = Json.list(meta, "snapshots")
      .find(s => Json.long(s, "snapshot-id").contains(2L)).get
    val mlRows = avro(Json.str(snap2, "manifest-list").get)
    val delManifest = mlRows.find(_.get("content").toString == "1").get
    val delEntry = avro(delManifest.get("manifest_path").toString).head
      .get("data_file").asInstanceOf[GenericRecord]
    assert(delEntry.get("content").toString.toLong === 2L)
    assert(delEntry.get("equality_ids").asInstanceOf[java.util.List[_]]
      .asScala.map(_.toString.toLong).toSeq === Seq(1L))

    // STRICTLY-OLDER rule: re-append id=2 — the upsert primitive: the
    // old equality delete must NOT hit the newer file
    IcebergWrite.append(spark, Seq((2L, "b2", 20)).toDF("id", "v", "n"), root)
    assert(ids() === Seq(1L, 2L, 3L))

    // equality and position deletes stack
    IcebergWrite.delete(spark, root,
      org.apache.spark.sql.functions.col("id") === 1L)
    assert(ids() === Seq(2L, 3L))
    // empty key frame commits nothing
    val cur = Json.long(metaJson(root, 4), "current-snapshot-id").get
    assert(IcebergWrite.deleteEqual(spark, root, "id",
      spark.emptyDataset[Long].toDF("id")) === cur)
    // unknown column refuses by name
    val e = intercept[RuntimeException] {
      IcebergWrite.deleteEqual(spark, root, "nope", Seq(1L).toDF("nope"))
    }
    assert(e.getMessage.contains("no top-level column 'nope'"))

    // the graft import path applies the written equality deletes
    val gt = fresh() + "/gt"
    GraftTable.importIceberg(spark, root, gt, "id")
    assert(GraftTable.read(spark, gt).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted === Seq(2L, 3L))
  }

  test("concurrent appends land at distinct snapshots, no rows lost") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, df3, root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val fs = (1 to 3).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            IcebergWrite.append(spark,
              Seq((100L + i, s"w$i", i)).toDF("id", "v", "n"), root)
          }
        })
      }
      gate.countDown()
      val snaps = fs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(snaps.toSet.size == 3)
    } finally pool.shutdownNow()
    assert(IcebergRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 101L, 102L, 103L))
  }
}
