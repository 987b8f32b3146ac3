package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeltaRead, DeltaWrite}

/** Change Data Feed reads ([[DeltaRead.readChanges]]) — proven first
  * against this repo's own writer (every commit shape it emits must
  * attribute exactly: append, DV delete, copy-on-write delete where
  * SURVIVING rows must cancel out of the diff, overwrite, and the
  * dataChange=false purge which must contribute nothing), then
  * against a hand-authored `cdc`-action commit whose change-data
  * files are authoritative and whose add/remove actions must be
  * ignored, plus the two refusals (vacuumed commit in range, schema
  * change across the range). */
class DeltaCdfSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft_cdf_").toString

  private def changes(root: String, from: Long, to: Long): Seq[(Long, String, Long)] =
    DeltaRead.readChanges(spark, root, from, to)
      .select("_commit_version", "_change_type", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted

  test("writer-driven feed: append, DV delete, CoW delete, overwrite, purge") {
    import spark.implicits._
    val root = freshTable()
    // v0: create {1..4}
    DeltaWrite.create(spark,
      (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    // v1: append {5}
    DeltaWrite.append(spark, Seq((5L, "v5")).toDF("id", "v"), root)
    // v2: DV delete of {2} — remove(f, -)+add(f, dv): diff = the hidden row
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    // v3: CoW delete of {3} — the file rewrites; survivors must CANCEL
    DeltaWrite.delete(spark, root, col("id") === 3L)
    // v4: overwrite with {10}
    DeltaWrite.overwrite(spark, Seq((10L, "x")).toDF("id", "v"), root)
    // v5: append a 2-row file, v6: DV delete of one of its rows
    // (partial — a vector lands), v7: purge (dataChange=false)
    DeltaWrite.append(spark,
      Seq((11L, "y"), (12L, "z")).toDF("id", "v").coalesce(1), root) // v5
    DeltaWrite.deleteWithDv(spark, root, col("id") === 11L) // v6
    val purgeV = DeltaWrite.purgeVectors(spark, root) // v7
    assert(purgeV === 7L)

    assert(changes(root, 0, 0) ===
      (1L to 4L).map(i => (0L, "insert", i)))
    assert(changes(root, 1, 1) === Seq((1L, "insert", 5L)))
    assert(changes(root, 2, 2) === Seq((2L, "delete", 2L)))
    // ONLY the deleted row — the rewrite's surviving rows are not changes
    assert(changes(root, 3, 3) === Seq((3L, "delete", 3L)))
    // overwrite: all pre-commit visible rows delete, the new row inserts
    assert(changes(root, 4, 4) ===
      Seq((4L, "delete", 1L), (4L, "delete", 4L), (4L, "delete", 5L),
        (4L, "insert", 10L)))
    assert(changes(root, 5, 6) ===
      Seq((5L, "insert", 11L), (5L, "insert", 12L), (6L, "delete", 11L)))
    // the purge commit changed nothing
    assert(changes(root, 7, 7) === Seq.empty)
    // and the whole range unions cleanly
    assert(changes(root, 0, 7).size === 4 + 1 + 1 + 1 + 4 + 2 + 1)
  }

  test("cdc actions are authoritative; the commit's file actions are ignored") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)

    // hand-author commit 1: a cdc action + dataChange add/remove that
    // a conformant CDF reader must NOT surface
    val cd = Seq((2L, "b", "update_preimage"), (2L, "B2", "update_postimage"))
      .toDF("id", "v", "_change_type")
    val tmp = Paths.get(root, ".cdstage")
    cd.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.createDirectories(Paths.get(root, "_change_data"))
    Files.move(part, Paths.get(root, "_change_data/cd1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk.close()
    // a fake rewritten data file for the add action
    val f2 = Seq((1L, "a"), (2L, "B2")).toDF("id", "v")
    val tmp2 = Paths.get(root, ".dstage")
    f2.coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = {
      val ls = Files.list(tmp2)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.move(part2, Paths.get(root, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val walk2 = Files.walk(tmp2)
    try walk2.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk2.close()
    val oldAdd = DeltaRead.state(spark, root, 0).live.head._1
    Files.write(Paths.get(root, f"_delta_log/${1L}%020d.json"),
      (s"""{"cdc":{"path":"_change_data/cd1.parquet","partitionValues":{},"size":1,"dataChange":false}}""" + "\n" +
        s"""{"remove":{"path":"$oldAdd","deletionTimestamp":0,"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))

    val got = DeltaRead.readChanges(spark, root, 1, 1)
      .select("_commit_version", "_change_type", "id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.sorted
    assert(got === Seq((1L, "update_postimage", 2L, "B2"),
      (1L, "update_preimage", 2L, "b")))
    // the snapshot itself still reflects the file actions
    assert(DeltaRead.read(spark, root).orderBy("id")
      .collect().map(_.getString(1)).toSeq === Seq("a", "B2"))
  }

  test("CDF WRITES: row-subset deletes emit authoritative cdc actions + " +
      "_change_data files (r15)") {
    import spark.implicits._
    val root = freshTable()
    // partitioned CDF table from day one — protocol must declare the
    // writer feature
    DeltaWrite.create(spark,
      Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"), (4L, "d", "y"))
        .toDF("id", "v", "p").coalesce(1),
      root, partitionBy = Seq("p"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val st0 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st0.minReader === 1L && st0.minWriter === 7L)
    assert(st0.writerFeatures ===
      Set("appendOnly", "changeDataFeed", "invariants"))

    def commitActions(v: Long): Seq[Map[String, Any]] =
      Files.readAllLines(Paths.get(root, f"_delta_log/$v%020d.json"))
        .asScala.filter(_.trim.nonEmpty)
        .map(l => graft.util.Json.parse(l).asInstanceOf[Map[String, Any]])
        .toSeq

    // v1: blind append — NO cdc (derivable from adds, per spec)
    DeltaWrite.append(spark, Seq((5L, "e", "x")).toDF("id", "v", "p"), root)
    assert(!commitActions(1L).exists(_.contains("cdc")))

    // v2: copy-on-write delete of a row SUBSET — cdc mandatory
    DeltaWrite.delete(spark, root, col("id") === 1L)
    val cdc2 = commitActions(2L).flatMap(_.get("cdc"))
    assert(cdc2.nonEmpty)
    cdc2.foreach { c =>
      val path = graft.util.Json.str(c, "path").get
      assert(path.startsWith("_change_data/"))
      assert(graft.util.Json.get(c, "dataChange") === java.lang.Boolean.FALSE)
      // partition values ride the action; the FILE carries data cols +
      // _change_type only
      assert(graft.util.Json.get(c, "partitionValues")
        .asInstanceOf[Map[String, Any]].keySet === Set("p"))
      val cols = spark.read.parquet(Paths.get(root, path).toString)
        .columns.toSet
      assert(cols === Set("id", "v", "_change_type"))
    }
    assert(changes(root, 2, 2) === Seq((2L, "delete", 1L)))

    // v3: DV delete — cdc carries exactly the newly hidden rows
    DeltaWrite.deleteWithDv(spark, root, col("id").isin(2L, 3L))
    assert(commitActions(3L).exists(_.contains("cdc")))
    assert(changes(root, 3, 3) ===
      Seq((3L, "delete", 2L), (3L, "delete", 3L)))

    // v4: purge (dataChange=false) still contributes nothing
    DeltaWrite.purgeVectors(spark, root)
    assert(!commitActions(4L).exists(_.contains("cdc")))
    assert(changes(root, 0, 4).count(_._2 == "delete") === 3)

    // checkpoint a changeDataFeed-featured table and bootstrap past it
    val cpV = DeltaWrite.checkpoint(spark, root)
    (0L until cpV).foreach(v =>
      Files.delete(Paths.get(root, f"_delta_log/$v%020d.json")))
    assert(DeltaRead.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet === Set(4L, 5L))
  }

  test("CDF writes on a COLUMN-MAPPED table: physical change files, " +
      "physical pv keys, logical feed") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p"),
      root, partitionBy = Seq("p"),
      configuration = Map("delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st.writerFeatures === Set("appendOnly", "changeDataFeed",
      "columnMapping", "invariants"))
    DeltaWrite.delete(spark, root, col("id") === 2L)

    val cdc = Files.readAllLines(
      Paths.get(root, f"_delta_log/${1L}%020d.json")).asScala
      .filter(_.contains("\"cdc\""))
      .map(l => graft.util.Json.get(graft.util.Json.parse(l), "cdc"))
    assert(cdc.nonEmpty)
    val physP = st.meta.schema.fields.find(_.name == "p").get
      .metadata.getString("delta.columnMapping.physicalName")
    cdc.foreach { c =>
      // pv keyed PHYSICALLY, file columns physical + literal _change_type
      assert(graft.util.Json.get(c, "partitionValues")
        .asInstanceOf[Map[String, Any]].keySet === Set(physP))
      val cols = spark.read.parquet(Paths.get(root,
        graft.util.Json.str(c, "path").get).toString).columns.toSet
      assert(cols.contains("_change_type"))
      assert((cols - "_change_type").forall(_.startsWith("col-")))
    }
    // the reader's mapped cdc branch (ADVICE r14 fix) resolves it all
    // back to logical shape
    val got = DeltaRead.readChanges(spark, root, 1, 1)
      .select("_change_type", "id", "v", "p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(("delete", 2L, "b", "y")))
  }

  test("refusals: vacuumed commit in range; schema change across the range") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    Files.delete(Paths.get(root, f"_delta_log/${0L}%020d.json"))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, root, 0, 2)
    }
    assert(e.getMessage.contains("vacuumed"))
    // surviving commits still feed
    assert(changes(root, 1, 2) ===
      Seq((1L, "insert", 2L), (2L, "insert", 3L)))

    // schema change mid-range refuses by version pair
    val meta1 = DeltaRead.state(spark, root, Long.MaxValue).meta
    val widened = org.apache.spark.sql.types.StructType(
      meta1.schema.fields :+ org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType))
    Files.write(Paths.get(root, f"_delta_log/${3L}%020d.json"),
      (s"""{"metaData":{"id":"${meta1.id}","format":{"provider":"parquet","options":{}},"schemaString":${
        graft.util.Json.render(widened.json)
      },"partitionColumns":[],"configuration":{},"createdTime":0}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, root, 2, 3)
    }
    assert(e2.getMessage.contains("schema changes between versions"))
  }
}
