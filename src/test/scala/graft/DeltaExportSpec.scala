package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeltaRead, DeltaWrite, GraftTable}

/** GraftTable → Delta mirror (exportDelta / syncToDelta): the OUTBOUND
  * half of the lakehouse interop story. Because both layouts share the
  * immutable-file + manifest skeleton, the export must be pure
  * metadata translation — these tests assert snapshot equality at
  * EVERY mirrored version (including through merges with updates,
  * deletes, and inserts), hard-link physics (no byte duplication),
  * crash adoption via the commit's graft-version tag, and the foreign-
  * writer refusal. */
class DeltaExportSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_export_").toString

  private def docs: DataFrame = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"text-$i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
  }

  /** A merge batch updating ids ≡0 (mod 7), deleting ≡1, inserting
    * fresh ids for ≡2 — the GraftTableSpec shape, minus the source
    * column. */
  private def batch(tag: String): DataFrame = {
    import spark.implicits._
    docs.where(col("doc_id") % 7 < 3)
      .select(
        when(col("doc_id") % 7 === 2, col("doc_id") + 10000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        (col("doc_id") % 7 === 1).as("is_delete"),
        when(col("doc_id") % 7 === 0, concat(lit(s"$tag: "), col("text")))
          .when(col("doc_id") % 7 === 2, col("text"))
          .otherwise(lit(null).cast("string")).as("new_text"),
        when(col("doc_id") % 7 === 2, col("lang"))
          .otherwise(lit(null).cast("string")).as("new_lang"))
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select("doc_id", "text", "lang").collect().map(_.toSeq.toVector).toSet

  test("export + sync mirror every graft version, snapshot-equal " +
      "through update/delete/insert merges") {
    val root = fresh() + "/gt"
    val delta = fresh() + "/dl"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    assert(GraftTable.exportDelta(spark, root, delta) == 0L)
    assert(rows(DeltaRead.read(spark, delta)) == rows(docs))

    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.merge(spark, root, batch("m2"))
    val synced = GraftTable.syncToDelta(spark, root)
    assert(synced.map(_._1) == Seq(2, 3))

    // every Delta version ≡ the graft version it mirrors
    synced.foreach { case (g, dv) =>
      assert(rows(DeltaRead.read(spark, delta, dv.toInt)) ==
        rows(GraftTable.read(spark, root, g)),
        s"graft v$g vs delta v$dv diverged")
    }
    // version 0 still mirrors graft v1 (time travel intact)
    assert(rows(DeltaRead.read(spark, delta, 0)) ==
      rows(GraftTable.read(spark, root, 1)))
    // nothing new → no-op
    assert(GraftTable.syncToDelta(spark, root).isEmpty)
  }

  test("export is hard-linked metadata translation: no byte duplication, " +
      "no data job") {
    val root = fresh() + "/gt"
    val delta = fresh() + "/dl"
    val snap = GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportDelta(spark, root, delta)
    snap.files.foreach { f =>
      val src = Paths.get(f.path)
      val dest = Paths.get(delta).resolve(src.getFileName)
      assert(Files.exists(dest))
      // same inode — the export copied ZERO data bytes
      assert(Files.getAttribute(src, "unix:ino") ==
        Files.getAttribute(dest, "unix:ino"),
        s"${src.getFileName} was copied, not linked")
    }
    // manifest stats became Delta file-skipping stats
    val adds = Files.readAllLines(
      Paths.get(delta, "_delta_log", f"${0L}%020d.json"))
    import scala.jdk.CollectionConverters._
    val stats = adds.asScala.map(graft.util.Json.parse)
      .flatMap(m => graft.util.Json.str(m, "add", "stats"))
      .map(graft.util.Json.parse)
    assert(stats.size == snap.files.size)
    assert(stats.map(s => graft.util.Json.long(s, "numRecords").get).sum == 200L)
    assert(stats.forall(s =>
      graft.util.Json.long(s, "minValues", "doc_id").isDefined &&
      graft.util.Json.long(s, "maxValues", "doc_id").isDefined))
  }

  test("crash between Delta commit and marker is adopted, not re-applied") {
    val root = fresh() + "/gt"
    val delta = fresh() + "/dl"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportDelta(spark, root, delta)
    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.syncToDelta(spark, root)

    // simulate the crash: rewind the marker to the export state —
    // Delta v1 (graft v2) now looks "ahead of" the marker
    GraftTable.merge(spark, root, batch("m2"))
    val marker = Paths.get(root, "delta_export.json")
    Files.writeString(marker, graft.util.Json.render(
      scala.collection.immutable.ListMap(
        "deltaRoot" -> delta, "graftVersion" -> 1L, "deltaVersion" -> 0L)))

    val synced = GraftTable.syncToDelta(spark, root)
    // only graft v3 produced a NEW commit; v2's was adopted from the tag
    assert(synced.map(_._1) == Seq(3))
    assert(GraftTable.deltaExportState(root).map(_._3).contains(2L))
    assert(rows(DeltaRead.read(spark, delta)) ==
      rows(GraftTable.read(spark, root, 3)))
  }

  test("a foreign writer on the mirrored table is refused, not diverged") {
    import spark.implicits._
    val root = fresh() + "/gt"
    val delta = fresh() + "/dl"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportDelta(spark, root, delta)
    // someone else appends to the Delta table directly
    DeltaWrite.append(spark,
      Seq((9999L, "foreign", "xx")).toDF("doc_id", "text", "lang"), delta)
    GraftTable.merge(spark, root, batch("m1"))
    val e = intercept[Exception] { GraftTable.syncToDelta(spark, root) }
    assert(e.getMessage.contains("foreign"))
  }

  test("the two halves compose: DeltaWrite-driven table syncs INTO a " +
      "GraftTable version-for-version") {
    import spark.implicits._
    val delta = fresh() + "/dl"
    val gt = fresh() + "/gt"
    def rows3(df: DataFrame): Set[(Long, String, String)] =
      df.select("doc_id", "text", "lang").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    // a live writer (ours) produces versions; the CDC sync tails them
    DeltaWrite.create(spark, docs.limit(50), delta)
    GraftTable.importDelta(spark, delta, gt, key = "doc_id")
    DeltaWrite.append(spark,
      Seq((1000L, "late", "l9")).toDF("doc_id", "text", "lang"), delta)
    DeltaWrite.delete(spark, delta, col("doc_id") < 10L)
    val synced = GraftTable.syncDelta(spark, gt)
    assert(synced.map(_._1) == Seq(1L, 2L))
    assert(rows3(GraftTable.read(spark, gt)) ==
      rows3(DeltaRead.read(spark, delta)))
    // and a checkpoint on the writer side doesn't confuse the sync
    DeltaWrite.checkpoint(spark, delta)
    DeltaWrite.append(spark,
      Seq((1001L, "later", "l9")).toDF("doc_id", "text", "lang"), delta)
    GraftTable.syncDelta(spark, gt)
    assert(rows3(GraftTable.read(spark, gt)) ==
      rows3(DeltaRead.read(spark, delta)))
  }

  test("exported table is a first-class Delta table: checkpoint + " +
      "re-import round-trip") {
    val root = fresh() + "/gt"
    val delta = fresh() + "/dl"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportDelta(spark, root, delta)
    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.syncToDelta(spark, root)
    // writer-side checkpoint on the mirror
    assert(DeltaWrite.checkpoint(spark, delta) == 1L)
    Files.delete(Paths.get(delta, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(delta, "_delta_log", f"${1L}%020d.json"))
    // full circle: Delta → a NEW GraftTable, snapshot-equal
    val back = fresh() + "/gt2"
    GraftTable.importDelta(spark, delta, back, key = "doc_id")
    assert(rows(GraftTable.read(spark, back)) ==
      rows(GraftTable.read(spark, root)))
  }
}
