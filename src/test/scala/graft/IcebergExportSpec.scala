package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, IcebergRead, IcebergWrite}
import graft.util.Json

/** GraftTable → Iceberg mirror (exportIceberg / syncToIceberg) —
  * VERDICT r13 #4, held to DeltaExportSpec's bar: snapshot equality at
  * EVERY mirrored version through update/delete/insert merges, crash
  * adoption via the snapshot's graft-version summary tag, and the
  * foreign-writer refusal. The export is ZERO-COPY via the spec's
  * name-mapping migration path (GraftTable parquet carries no field
  * ids; `schema.name-mapping.default` is how conformant readers
  * resolve such files), so these tests also assert hard-link physics
  * and the mapping property's shape. */
class IcebergExportSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_iexport_").toString

  private def docs: DataFrame = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"text-$i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
  }

  /** The DeltaExportSpec merge shape: update ids ≡0 (mod 7), delete
    * ≡1, insert fresh ids for ≡2. */
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

  private def curMeta(ice: String): Any =
    Json.parse(Files.readString(Paths.get(ice, "metadata",
      s"v${Files.readString(Paths.get(ice, "metadata", "version-hint.text")).trim}.metadata.json")))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select("doc_id", "text", "lang").collect().map(_.toSeq.toVector).toSet

  test("export + sync mirror every graft version, snapshot-equal " +
      "through update/delete/insert merges") {
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    assert(GraftTable.exportIceberg(spark, root, ice) == 1L)
    assert(rows(IcebergRead.read(spark, ice)) == rows(docs))

    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.merge(spark, root, batch("m2"))
    val synced = GraftTable.syncToIceberg(spark, root)
    assert(synced.map(_._1) == Seq(2, 3))

    // every Iceberg snapshot ≡ the graft version it mirrors
    synced.foreach { case (g, sid) =>
      assert(rows(IcebergRead.read(spark, ice, sid)) ==
        rows(GraftTable.read(spark, root, g)),
        s"graft v$g vs iceberg snapshot $sid diverged")
    }
    // snapshot 1 still mirrors graft v1 (time travel intact)
    assert(rows(IcebergRead.read(spark, ice, 1L)) ==
      rows(GraftTable.read(spark, root, 1)))
    // nothing new → no-op
    assert(GraftTable.syncToIceberg(spark, root).isEmpty)
  }

  test("a pure-delete merge mirrors as a v2 position-delete snapshot (r15)") {
    import spark.implicits._
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportIceberg(spark, root, ice)
    def pureDel(mod: Long): DataFrame =
      docs.where(col("doc_id") % 10 === mod)
        .select(col("doc_id"), lit(true).as("is_delete"),
          lit(null).cast("string").as("new_text"),
          lit(null).cast("string").as("new_lang"))
    def dataFiles(): Set[String] = {
      val ls = Files.list(Paths.get(ice, "data"))
      try ls.iterator().asScala.map(_.getFileName.toString).toSet
      finally ls.close()
    }
    val before = dataFiles()

    GraftTable.merge(spark, root, pureDel(0L)) // graft v2
    val synced = GraftTable.syncToIceberg(spark, root)
    assert(synced.map(_._1) == Seq(2))
    val sid = synced.head._2
    // content equality — the mirror invariant holds
    assert(rows(IcebergRead.read(spark, ice, sid)) ==
      rows(GraftTable.read(spark, root, 2)))
    // ...but expressed as a VISIBILITY commit: op=delete, tagged, and
    // the only new file under data/ is the position-delete file (the
    // graft rewrites were NOT adopted)
    val meta = curMeta(ice)
    val snap = Json.list(meta, "snapshots")
      .find(s => Json.long(s, "snapshot-id").contains(sid)).get
    assert(Json.str(snap, "summary", "operation").contains("delete"))
    assert(Json.str(snap, "summary", "graft-version").contains("2"))
    val after = dataFiles()
    assert(before.subsetOf(after) &&
      (after -- before).forall(_.startsWith("delete-")))

    // a SECOND pure delete stacks against the mirror's own visible
    // rows (positions computed after the first delete applies)
    GraftTable.merge(spark, root, pureDel(1L)) // graft v3
    val synced2 = GraftTable.syncToIceberg(spark, root)
    assert(rows(IcebergRead.read(spark, ice, synced2.head._2)) ==
      rows(GraftTable.read(spark, root, 3)))

    // an update/insert-bearing merge falls back to the full-listing
    // mirror and republishes graft's file set — still snapshot-equal
    GraftTable.merge(spark, root, batch("m4")) // graft v4
    val synced3 = GraftTable.syncToIceberg(spark, root)
    val sid4 = synced3.head._2
    val snap4 = Json.list(curMeta(ice), "snapshots")
      .find(s => Json.long(s, "snapshot-id").contains(sid4)).get
    assert(!Json.str(snap4, "summary", "operation").contains("delete"))
    assert(rows(IcebergRead.read(spark, ice, sid4)) ==
      rows(GraftTable.read(spark, root, 4)))
    // and the re-import full circle (current snapshot) stays equal
    val back = fresh() + "/back"
    GraftTable.importIceberg(spark, ice, back, "doc_id")
    assert(rows(GraftTable.read(spark, back)) ==
      rows(GraftTable.read(spark, root, 4)))
  }

  test("export is hard-linked metadata translation with a spec-shaped " +
      "name mapping") {
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    val snap = GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportIceberg(spark, root, ice)
    snap.files.foreach { f =>
      val src = Paths.get(f.path)
      val dest = Paths.get(ice, "data").resolve(src.getFileName)
      assert(Files.exists(dest))
      // same inode — the export copied ZERO data bytes
      assert(Files.getAttribute(src, "unix:ino") ==
        Files.getAttribute(dest, "unix:ino"),
        s"${src.getFileName} was copied, not linked")
    }
    val meta = Json.parse(Files.readString(
      Paths.get(ice, "metadata", "v1.metadata.json")))
    // the migration property conformant readers resolve id-less files by
    val nm = Json.str(meta, "properties", "schema.name-mapping.default")
      .map(Json.parse).get.asInstanceOf[List[Any]]
    assert(nm.map(e => (Json.long(e, "field-id").get,
      Json.list(e, "names").map(_.toString))) ==
      List((1L, List("doc_id")), (2L, List("text")), (3L, List("lang"))))
    // manifest row counts come from the GraftTable manifest, no footer read
    val snapEntry = Json.list(meta, "snapshots").head
    val mlReader = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
      new java.io.File(Json.str(snapEntry, "manifest-list").get),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val ml = try mlReader.iterator.asScala.toVector finally mlReader.close()
    assert(ml.map(_.get("added_rows_count").toString.toLong).sum == 200L)
  }

  test("crash between Iceberg commit and marker is adopted, not re-applied") {
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportIceberg(spark, root, ice)
    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.syncToIceberg(spark, root)

    // simulate the crash: rewind the marker to the export state —
    // snapshot 2 (graft v2) now looks "ahead of" the marker
    GraftTable.merge(spark, root, batch("m2"))
    Files.writeString(Paths.get(root, "iceberg_export.json"),
      Json.render(scala.collection.immutable.ListMap(
        "icebergRoot" -> ice, "graftVersion" -> 1L, "snapshotId" -> 1L)))

    val synced = GraftTable.syncToIceberg(spark, root)
    // only graft v3 produced a NEW snapshot; v2's was adopted from the tag
    assert(synced.map(_._1) == Seq(3))
    assert(GraftTable.icebergExportState(root).map(_._2).contains(3))
    assert(rows(IcebergRead.read(spark, ice)) ==
      rows(GraftTable.read(spark, root, 3)))
  }

  test("a foreign writer on the mirrored table is refused, not diverged") {
    import spark.implicits._
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportIceberg(spark, root, ice)
    // someone else appends to the Iceberg table directly
    IcebergWrite.append(spark,
      Seq((9999L, "foreign", "xx")).toDF("doc_id", "text", "lang"), ice)
    GraftTable.merge(spark, root, batch("m1"))
    val e = intercept[Exception] { GraftTable.syncToIceberg(spark, root) }
    assert(e.getMessage.contains("foreign"))
  }

  test("full circle: the mirrored table re-imports snapshot-equal") {
    val root = fresh() + "/gt"
    val ice = fresh() + "/ib"
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.exportIceberg(spark, root, ice)
    GraftTable.merge(spark, root, batch("m1"))
    GraftTable.syncToIceberg(spark, root)
    val back = fresh() + "/gt2"
    GraftTable.importIceberg(spark, ice, back, key = "doc_id")
    assert(rows(GraftTable.read(spark, back)) ==
      rows(GraftTable.read(spark, root)))
  }
}
