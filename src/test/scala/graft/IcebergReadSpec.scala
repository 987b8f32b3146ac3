package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.sources.IcebergRead

/** Read-side interop with the open Apache Iceberg spec, proven against
  * hand-authored tables: metadata JSON written literally to the spec,
  * manifest-list + manifest files written through avro-core (the same
  * jars Spark ships), data files written as ordinary parquet. Covers
  * snapshot resolution via version-hint, time travel by snapshot id,
  * deleted-entry exclusion, schema conversion (incl. nested and
  * decimal types), and the loud refusal of unknown content codes
  * (v2 row-level deletes themselves READ — IcebergDeleteSpec). */
class IcebergReadSpec extends SparkSpec {

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

  private def manifestListRow(path: String, content: Int = 0): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("content", content)
    r
  }

  private def manifestRow(status: Int, filePath: String,
                          content: Int = 0): GenericRecord = {
    val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
    df.put("content", content); df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    val r = new GenericData.Record(manifestSchema)
    r.put("status", status); r.put("data_file", df)
    r
  }

  /** Stamps `parquet.field.id` metadata so the parquet writer embeds
    * field ids — what every real Iceberg writer does, and what the
    * reader's id-based resolution requires of data files. */
  private def withIds(df: DataFrame, ids: Map[String, Long]): DataFrame = {
    val fields = df.schema.fields.map(f => ids.get(f.name).map(id =>
      f.copy(metadata = new MetadataBuilder()
        .putLong("parquet.field.id", id).build())).getOrElse(f))
    df.sparkSession.createDataFrame(df.rdd, StructType(fields))
  }

  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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

  private val schemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}]}""".stripMargin

  /** Builds a 2-snapshot table: snap 1 = {f1}, snap 2 = {f1, f2} with
    * a status-2 (deleted) tombstone for a never-live f0. */
  private def buildTable(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_iceberg_").toString
    val md = Paths.get(root, "metadata")
    Files.createDirectories(md)
    dataFile(root, "f1.parquet",
      withIds(Seq((1L, "a")).toDF("id", "v"), Map("id" -> 1L, "v" -> 2L)))
    dataFile(root, "f2.parquet",
      withIds(Seq((2L, "b")).toDF("id", "v"), Map("id" -> 1L, "v" -> 2L)))

    avroWrite(md.resolve("m1.avro").toString, manifestSchema,
      Seq(manifestRow(1, "data/f1.parquet")))
    avroWrite(md.resolve("m2.avro").toString, manifestSchema,
      Seq(manifestRow(0, "data/f1.parquet"),
        manifestRow(1, "data/f2.parquet"),
        manifestRow(2, "data/f0.parquet"))) // tombstone — must be ignored
    avroWrite(md.resolve("snap-1.avro").toString, manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro")))
    avroWrite(md.resolve("snap-2.avro").toString, manifestListSchema,
      Seq(manifestListRow("metadata/m2.avro")))

    Files.writeString(md.resolve("v3.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"},
         |{"snapshot-id":2,"schema-id":0,"manifest-list":"metadata/snap-2.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "3")
    root
  }

  test("reads the current snapshot; deleted entries are excluded") {
    val root = buildTable()
    val got = IcebergRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "v"))
    assert(got.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("time travel by snapshot id") {
    val root = buildTable()
    val got = IcebergRead.read(spark, root, snapshotId = 1L)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a")))
  }

  test("refuses files with an unknown content code instead of guessing") {
    // position (1) and equality (2) deletes READ since r14
    // (IcebergDeleteSpec); anything else is future spec surface and
    // must refuse by code
    val root = buildTable()
    val md = Paths.get(root, "metadata")
    avroWrite(md.resolve("snap-3.avro").toString, manifestListSchema,
      Seq(manifestListRow("metadata/m2.avro"),
        manifestListRow("metadata/mdel.avro", content = 1)))
    avroWrite(md.resolve("mdel.avro").toString, manifestSchema,
      Seq(manifestRow(1, "data/mystery.parquet", content = 7)))
    Files.writeString(md.resolve("v4.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":3,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":3,"schema-id":0,"manifest-list":"metadata/snap-3.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "4")
    val e = intercept[RuntimeException] { IcebergRead.read(spark, root) }
    assert(e.getMessage.contains("unknown content=7"))
  }

  test("importIceberg snapshots into a GraftTable, contents intact") {
    val root = buildTable()
    val gt = Files.createTempDirectory("graft_import_ice_").toString
    val snap = graft.sources.GraftTable.importIceberg(spark, root, gt, "id", 2)
    assert(snap.version === 1)
    val want = graft.sources.IcebergRead.read(spark, root)
    val back = graft.sources.GraftTable.read(spark, gt)
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
  }

  test("renamed column resolves by field id: pre-rename files keep their values") {
    val root = buildTable()
    val md = Paths.get(root, "metadata")
    // the table renames v -> w (same field id 2): the spec mandates
    // id-based resolution, so data files written under the OLD name
    // must still surface their values under the new one — a by-name
    // read returns NULL here (the ADVICE r12 silent mis-read)
    val renamed =
      """{"type":"struct","schema-id":1,"fields":[
        |{"id":1,"name":"id","required":true,"type":"long"},
        |{"id":2,"name":"w","required":false,"type":"string"}]}""".stripMargin
    Files.writeString(md.resolve("v5.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":2,
         |"schemas":[$schemaJson,$renamed],"current-schema-id":1,
         |"snapshots":[
         |{"snapshot-id":1,"schema-id":0,"manifest-list":"metadata/snap-1.avro"},
         |{"snapshot-id":2,"schema-id":1,"manifest-list":"metadata/snap-2.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "5")
    val got = IcebergRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "w"))
    assert(got.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b")),
      "pre-rename data files must resolve by field id, not return NULL")
  }

  test("refuses id-less data files loudly instead of nulling") {
    import spark.implicits._
    val root = buildTable()
    val md = Paths.get(root, "metadata")
    // a data file WITHOUT parquet field ids (a name-mapping table this
    // reader does not implement) must error, not silently match-by-name
    dataFile(root, "noids.parquet", Seq((9L, "z")).toDF("id", "v"))
    avroWrite(md.resolve("m3.avro").toString, manifestSchema,
      Seq(manifestRow(1, "data/noids.parquet")))
    avroWrite(md.resolve("snap-9.avro").toString, manifestListSchema,
      Seq(manifestListRow("metadata/m3.avro")))
    Files.writeString(md.resolve("v6.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"$root",
         |"current-snapshot-id":9,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"snapshots":[
         |{"snapshot-id":9,"schema-id":0,"manifest-list":"metadata/snap-9.avro"}
         |]}""".stripMargin)
    Files.writeString(md.resolve("version-hint.text"), "6")
    val e = intercept[Throwable] {
      IcebergRead.read(spark, root).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.toLowerCase.contains("field id"),
      s"expected a loud field-id error, got: $chain")
  }

  test("type conversion covers the spec's primitives and composites") {
    val t = graft.util.Json.parse(
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"b","required":true,"type":"boolean"},
        |{"id":2,"name":"i","required":true,"type":"int"},
        |{"id":3,"name":"d","required":false,"type":"decimal(10, 2)"},
        |{"id":4,"name":"fx","required":false,"type":"fixed[16]"},
        |{"id":5,"name":"ts","required":false,"type":"timestamptz"},
        |{"id":6,"name":"tags","required":false,"type":
        |  {"type":"list","element-id":7,"element":"string","element-required":true}},
        |{"id":8,"name":"props","required":false,"type":
        |  {"type":"map","key-id":9,"key":"string","value-id":10,
        |   "value":"long","value-required":false}},
        |{"id":11,"name":"nested","required":false,"type":
        |  {"type":"struct","fields":[
        |    {"id":12,"name":"x","required":true,"type":"double"}]}}
        |]}""".stripMargin)
    val s = IcebergRead.toSpark(t).asInstanceOf[StructType]
    assert(s("b").dataType === BooleanType && !s("b").nullable)
    assert(s("i").dataType === IntegerType)
    assert(s("d").dataType === DecimalType(10, 2) && s("d").nullable)
    assert(s("fx").dataType === BinaryType)
    assert(s("ts").dataType === TimestampType)
    assert(s("tags").dataType ===
      ArrayType(StringType, containsNull = false))
    assert(s("props").dataType ===
      MapType(StringType, LongType, valueContainsNull = true))
    assert(s("nested").dataType.asInstanceOf[StructType]("x")
      .dataType === DoubleType)
  }

  test("Json parser round-trips the grammar (escapes, numbers, nesting)") {
    val v = graft.util.Json.parse(
      """{"a": [1, -2.5, 3e2, true, false, null],
        |"s": "q\"uote\\backA", "o": {"k": 9}}""".stripMargin)
    assert(graft.util.Json.list(v, "a") ===
      List(1L, -2.5, 300.0, true, false, null))
    assert(graft.util.Json.str(v, "s") === Some("q\"uote\\backA"))
    assert(graft.util.Json.long(v, "o", "k") === Some(9L))
    intercept[IllegalArgumentException] { graft.util.Json.parse("{\"a\": }") }
    intercept[IllegalArgumentException] { graft.util.Json.parse("[1] trailing") }
  }
}
