package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{DeltaRead, DeltaWrite}
import graft.util.Json

/** COLUMN-MAPPED writes (r15) — [[DeltaWrite]] on
  * `delta.columnMapping.mode` name/id tables: create decorates the
  * schema with physical names + field ids and declares (3,7) with
  * columnMapping; stage writes data files under the PHYSICAL names
  * (footer field ids in id mode), keys partitionValues and stats
  * physically per the spec's writer requirements; append / delete /
  * deleteWithDv / overwrite / checkpoint all work through renames and
  * drops, readable at every version by [[DeltaRead.read]]. Plus the
  * legacy-bundle gate: a (2,5) mapped table — the shape delta-spark
  * actually produces — appends, while tables genuinely USING an
  * unimplemented legacy feature (CHECK constraints, CDF, generated /
  * identity columns) still refuse by name. */
class DeltaMappedWriteSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_cmw_").toString

  private def rows(root: String, v: Int = Int.MaxValue): Set[Seq[Any]] =
    DeltaRead.read(spark, root, v).collect()
      .map(_.toSeq.map {
        case null => null
        case s: String => s
        case l: Long => l
      }.toVector).toSet

  /** Hand-evolve the table's schema with a metaData commit that keeps
    * every surviving field's mapping identity — the rename/drop shape
    * a foreign engine's ALTER TABLE produces. */
  private def evolveSchema(root: String, edit: StructType => StructType,
                           confEdit: Map[String, String] => Map[String, String]
                             = identity): Long = {
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    val schema = edit(st.meta.schema)
    val v = st.version + 1
    val line = Json.render(ListMap("metaData" -> ListMap(
      "id" -> st.meta.id,
      "format" -> ListMap("provider" -> "parquet", "options" -> ListMap.empty),
      "schemaString" -> schema.json,
      "partitionColumns" -> st.meta.partitionCols,
      "configuration" ->
        ListMap(confEdit(st.meta.configuration).toSeq.sortBy(_._1): _*),
      "createdTime" -> st.meta.createdTime.getOrElse(0L))))
    Files.write(Paths.get(root, "_delta_log", f"$v%020d.json"),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    v
  }

  private def mappedField(name: String, dt: DataType, phys: String,
                          id: Long): StructField =
    StructField(name, dt, nullable = true, new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id).build())

  private def physOf(root: String, logical: String): String = {
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    st.meta.schema.fields.find(_.name == logical).get
      .metadata.getString("delta.columnMapping.physicalName")
  }

  private def lifecycle(mode: String): Unit = {
    import spark.implicits._
    val root = fresh()
    // v0: create, partitioned — physical names from day one
    DeltaWrite.create(spark,
      Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"))
        .toDF("id", "v", "p"),
      root, partitionBy = Seq("p"),
      configuration = Map("delta.columnMapping.mode" -> mode))

    val st0 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st0.minReader === 3L && st0.minWriter === 7L)
    assert(st0.readerFeatures === Set("columnMapping"))
    assert(st0.writerFeatures ===
      Set("appendOnly", "columnMapping", "invariants"))
    assert(st0.meta.configuration("delta.columnMapping.maxColumnId") === "3")
    st0.meta.schema.fields.foreach { f =>
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"))
    }
    // partition DIRECTORIES and partitionValues keys are physical
    val physP = physOf(root, "p")
    assert(st0.live.nonEmpty &&
      st0.live.forall { case (path, pv) =>
        path.contains(s"$physP=") && pv.contains(physP) && !pv.contains("p")
      })
    // stats keys are physical too (spec: "track partition values and
    // column level statistics with the physical name")
    val physId = physOf(root, "id")
    val someStats = Json.parse(st0.stats.values.head)
    assert(Json.get(someStats, "minValues", physId) != null)
    assert(Json.get(someStats, "minValues", "id") == null)
    assert(rows(root) === Set(Vector(1L, "a", "x"), Vector(2L, "b", "x"),
      Vector(3L, "c", "y")))

    // v1: RENAME v -> w (foreign ALTER keeps the physical identity)
    evolveSchema(root, s => StructType(s.fields.map(f =>
      if (f.name == "v") f.copy(name = "w") else f)))
    // v2: append UNDER THE RENAME — pre-rename files must still read
    DeltaWrite.append(spark, Seq((4L, "d", "y")).toDF("id", "w", "p"), root)
    assert(DeltaRead.read(spark, root).columns.toSeq === Seq("id", "w", "p"))
    assert(rows(root) === Set(Vector(1L, "a", "x"), Vector(2L, "b", "x"),
      Vector(3L, "c", "y"), Vector(4L, "d", "y")))

    // v3: DV delete — stats copied with physical keys, vector applies
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    assert(rows(root) === Set(Vector(1L, "a", "x"), Vector(3L, "c", "y"),
      Vector(4L, "d", "y")))

    // v4: copy-on-write delete — the rewrite stays physical
    DeltaWrite.delete(spark, root, col("id") === 3L)
    assert(rows(root) === Set(Vector(1L, "a", "x"), Vector(4L, "d", "y")))

    // v5: DROP w, ADD n (fresh physical identity, maxColumnId bumps)
    evolveSchema(root,
      s => StructType(s.fields.flatMap {
        case f if f.name == "w" => None
        case f if f.name == "p" =>
          Seq(mappedField("n", LongType, "col-fresh-n", 4L), f)
        case f => Seq(f)
      }),
      conf => conf + ("delta.columnMapping.maxColumnId" -> "4"))
    // v6: append with the new shape; old files answer NULL for n
    DeltaWrite.append(spark, Seq((5L, 50L, "z")).toDF("id", "n", "p"), root)
    assert(DeltaRead.read(spark, root).columns.toSeq === Seq("id", "n", "p"))
    assert(rows(root) === Set(Vector(1L, null, "x"), Vector(4L, null, "y"),
      Vector(5L, 50L, "z")))

    // every version still time-travels correctly
    assert(rows(root, 0).map(_(0)) === Set(1L, 2L, 3L))
    assert(rows(root, 2).map(_(0)) === Set(1L, 2L, 3L, 4L))
    assert(rows(root, 3).map(_(0)) === Set(1L, 3L, 4L))

    // checkpoint the mapped table; bootstrap survives a vacuumed tail
    val cpV = DeltaWrite.checkpoint(spark, root)
    (0L to cpV - 1).foreach(v =>
      Files.delete(Paths.get(root, "_delta_log", f"$v%020d.json")))
    assert(rows(root) === Set(Vector(1L, null, "x"), Vector(4L, null, "y"),
      Vector(5L, 50L, "z")))

    // v7: overwrite through the mapping
    DeltaWrite.overwrite(spark,
      Seq((9L, 90L, "q")).toDF("id", "n", "p"), root)
    assert(rows(root) === Set(Vector(9L, 90L, "q")))
  }

  test("name mode: create/rename/drop/append/delete/DV/overwrite/checkpoint " +
      "round-trip at every version") {
    lifecycle("name")
  }

  test("id mode: the same lifecycle resolves by footer field ids") {
    // the id-mode read path pins fieldId.read.ignoreMissing=false, so
    // this passing also PROVES stage stamped footer ids into every
    // data file it wrote
    lifecycle("id")
  }

  test("readBetween file-skipping resolves stats under physical keys") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4),
      root, configuration = Map("delta.columnMapping.mode" -> "name"))
    val got = DeltaRead.readBetween(spark, root, "id", 10L, 12L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 11L, 12L))
  }

  test("legacy (2,5) mapped tables append; used legacy features refuse by name") {
    import spark.implicits._
    val root = fresh()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root,
      configuration = Map("delta.columnMapping.mode" -> "name"))
    // downgrade to the legacy bundle delta-spark actually writes for
    // column mapping
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    Files.write(Paths.get(root, "_delta_log", f"${st.version + 1}%020d.json"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    assert(rows(root).map(_(0)) === Set(1L, 2L))

    // a CHECK constraint makes the same table refuse, naming the reason
    evolveSchema(root, identity,
      conf => conf + ("delta.constraints.positive" -> "id > 0"))
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    }
    assert(e.getMessage.contains("CHECK"))

    // legacy v4: CDF is IMPLEMENTED (r15) so enabling it still writes
    // — a delete even emits the cdc the feature demands; generated
    // columns remain a by-name refusal
    val root2 = fresh()
    DeltaWrite.create(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1), root2)
    Files.write(Paths.get(root2, "_delta_log", f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    evolveSchema(root2, identity,
      conf => conf + ("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root2)
    DeltaWrite.delete(spark, root2, col("id") === 1L)
    assert(Files.readAllLines(Paths.get(root2, "_delta_log",
      f"${DeltaRead.state(spark, root2, Long.MaxValue).version}%020d.json"))
      .asScala.exists(_.contains("\"cdc\"")))

    val genField = StructType(Seq(StructField("g", LongType, nullable = true,
      new MetadataBuilder()
        .putString("delta.generationExpression", "id + 1").build())))
    evolveSchema(root2, s => StructType(s.fields ++ genField.fields))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark,
        Seq((4L, "d", 5L)).toDF("id", "v", "g"), root2)
    }
    assert(e2.getMessage.contains("generated"))
  }
}
