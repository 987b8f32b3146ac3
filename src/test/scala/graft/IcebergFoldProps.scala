package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.IcebergRead

/** Model-based property for [[IcebergRead]] (VERDICT r12 #2 — the
  * Iceberg mirror of DeltaFoldProps): RANDOM tables — arbitrary
  * snapshot sequences, manifests split arbitrarily, status-2 delete
  * tombstones scattered in, per-snapshot schema-id flips between two
  * schemas related by a COLUMN RENAME (same field id), snapshot
  * ancestry chains present — must reconstruct, at EVERY snapshotId,
  * exactly the live-file set an in-memory model computes, under the
  * snapshot's OWN schema (rename included, values non-null — i.e. the
  * field-id resolution holds for every random interleaving, not just
  * the fixed IcebergReadSpec fixtures). The format-version-3 refusal
  * and a minimal position-delete application (r14 — full delete
  * coverage in IcebergDeleteSpec) are pinned here too so the property
  * file is the one-stop contract.
  *
  * Native ScalaCheck `Properties` — same offline-framework note as
  * CompatWindowProps. */
object IcebergFoldProps extends Properties("IcebergFold") {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]").appName("IcebergFoldProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate() // shared JVM-wide with the ScalaTest suites

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25) // each case folds a whole table

  // ---- avro fixture writers (spec-shaped manifest list + manifest) --

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

  private def mlRow(path: String, content: Int = 0): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("content", content)
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

  /** Schema 0 names the value column `v`; schema 1 RENAMES it to `w`
    * under the SAME field id 2 — per-snapshot schema-id flips force
    * the reader to prove id-based resolution on every random table. */
  private val schema0 =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}]}""".stripMargin
  private val schema1 =
    """{"type":"struct","schema-id":1,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"w","required":false,"type":"string"}]}""".stripMargin

  /** The 8-path data-file pool (rows `(i, "p<i>")`, parquet field ids
    * embedded — what every real Iceberg writer emits), written ONCE
    * and referenced by absolute path from every generated table. */
  private lazy val pool: IndexedSeq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.types.{MetadataBuilder, StructType}
    val dir = Files.createTempDirectory("graft_ice_pool_")
    (0 to 7).map { i =>
      val df0 = Seq((i.toLong, s"p$i")).toDF("id", "v")
      val ids = Map("id" -> 1L, "v" -> 2L)
      val stamped = spark.createDataFrame(df0.rdd,
        StructType(df0.schema.fields.map(f =>
          f.copy(metadata = new MetadataBuilder()
            .putLong("parquet.field.id", ids(f.name)).build()))))
      val tmp = dir.resolve(s".s$i")
      stamped.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dest = dir.resolve(s"f$i.parquet")
      Files.move(part, dest)
      val walk = Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
      dest.toString
    }
  }

  /** One snapshot: which pool files are live, how many manifests the
    * entries are scattered over, which schema the snapshot declares,
    * and which dead paths get status-2 tombstones. */
  private case class SnapGen(live: Set[Int], nManifests: Int,
                             schemaId: Int, tombstones: Set[Int])

  private val genSnap: Gen[SnapGen] = for {
    live <- Gen.someOf(0 to 7).map(_.toSet)
    nManifests <- Gen.choose(1, 3)
    schemaId <- Gen.oneOf(0, 1)
    dead <- Gen.someOf((0 to 7).filterNot(live)).map(_.toSet)
  } yield SnapGen(live, nManifests, schemaId, dead)

  private val genTable: Gen[List[SnapGen]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genSnap))

  property("random tables fold to the model's live set at every snapshot, rename-correct") =
    forAll(genTable) { snaps =>
      val root = Files.createTempDirectory("graft_ice_prop_").toString
      val md = Paths.get(root, "metadata")
      Files.createDirectories(md)

      val snapJsons = snaps.zipWithIndex.map { case (sg, idx) =>
        val sid = idx + 1
        // scatter live entries over nManifests (status 0/1 both live),
        // tombstones appended round-robin — spec says status 2 entries
        // are DELETED in this snapshot and must not be read
        val liveSeq = sg.live.toSeq.sorted
        val buckets = Array.fill(sg.nManifests)(
          Vector.newBuilder[GenericRecord])
        liveSeq.zipWithIndex.foreach { case (i, k) =>
          buckets(k % sg.nManifests) += mRow(if (k % 2 == 0) 1 else 0, pool(i))
        }
        sg.tombstones.toSeq.sorted.zipWithIndex.foreach { case (i, k) =>
          buckets(k % sg.nManifests) += mRow(2, pool(i))
        }
        val manifestPaths = buckets.zipWithIndex.map { case (b, j) =>
          val p = md.resolve(s"m$sid-$j.avro").toString
          avroWrite(p, manifestSchema, b.result())
          p
        }
        avroWrite(md.resolve(s"snap-$sid.avro").toString, manifestListSchema,
          manifestPaths.toIndexedSeq.map(mlRow(_)))
        val parent =
          if (idx == 0) "" else s""""parent-snapshot-id":$idx,"""
        s"""{"snapshot-id":$sid,$parent"schema-id":${sg.schemaId},""" +
          s""""manifest-list":"${md.resolve(s"snap-$sid.avro")}"}"""
      }
      Files.writeString(md.resolve("v1.metadata.json"),
        s"""{"format-version":2,"table-uuid":"prop","location":"$root",
           |"current-snapshot-id":${snaps.size},
           |"schemas":[$schema0,$schema1],"current-schema-id":0,
           |"snapshots":[${snapJsons.mkString(",")}]}""".stripMargin)
      Files.writeString(md.resolve("version-hint.text"), "1")

      snaps.zipWithIndex.forall { case (sg, idx) =>
        val sid = idx + 1
        val got = IcebergRead.read(spark, root, sid.toLong)
        val valueCol = if (sg.schemaId == 1) "w" else "v"
        val colsOk = got.columns.toSeq == Seq("id", valueCol)
        val rows = got.collect()
          .map(r => (r.getLong(0).toInt, r.getString(1))).toSet
        val want = sg.live.map(i => (i, s"p$i"))
        val ok = colsOk && rows == want
        if (!ok) println(s"snap $sid: cols=${got.columns.toSeq} " +
          s"(want id,$valueCol) rows=$rows want=$want snaps=$snaps")
        ok
      }
    }

  property("format-version 3 is refused") = Prop {
    val root = Files.createTempDirectory("graft_ice_prop_v3_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    Files.writeString(md.resolve("v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"prop","location":"$root",
         |"current-snapshot-id":1,
         |"schemas":[$schema0],"current-schema-id":0,"snapshots":[]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "1")
    val e = intercept2[IllegalArgumentException](IcebergRead.read(spark, root))
    e.getMessage.contains("format-version 3")
  }

  property("a position delete drops the row (r14: deletes read, not refused)") = Prop {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ice_prop_del_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    // position delete targeting pool(0)'s single row; both data and
    // delete inherit sequence number 0 from schemaless ml entries, and
    // position deletes apply at EQUAL sequence numbers
    val posDel = {
      val tmp = md.resolve(".posdel")
      Seq((pool(0), 0L)).toDF("file_path", "pos")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dest = md.resolve("posdel.parquet")
      Files.move(part, dest)
      dest.toString
    }
    val delRow = {
      val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
      df.put("content", 1); df.put("file_path", posDel)
      df.put("file_format", "PARQUET")
      val r = new GenericData.Record(manifestSchema)
      r.put("status", 1); r.put("data_file", df)
      r
    }
    avroWrite(md.resolve("m0.avro").toString, manifestSchema,
      Seq(mRow(1, pool(0)), mRow(1, pool(1))))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema, Seq(delRow))
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema,
      Seq(mlRow(md.resolve("m0.avro").toString),
        mlRow(md.resolve("mdel.avro").toString, content = 1)))
    Files.writeString(md.resolve("v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"prop","location":"$root",
         |"current-snapshot-id":1,
         |"schemas":[$schema0],"current-schema-id":0,
         |"snapshots":[{"snapshot-id":1,"schema-id":0,
         |"manifest-list":"${md.resolve("snap-1.avro")}"}]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "1")
    IcebergRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L)
  }

  /** Tiny intercept for ScalaCheck props (no ScalaTest Assertions here). */
  private def intercept2[T <: Throwable](body: => Any)
      (implicit ct: scala.reflect.ClassTag[T]): T =
    try { body; sys.error(s"expected ${ct.runtimeClass.getSimpleName}") }
    catch {
      case t: Throwable if ct.runtimeClass.isInstance(t) => t.asInstanceOf[T]
    }
}
