package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeltaRead, DeltaWrite, GraftTable}

/** The deletion-vector WRITE path — [[DeltaWrite.deleteWithDv]], the
  * delete that rewrites no data bytes — proven end to end through the
  * repo's own reader at every version, plus the protocol upgrade it
  * performs, vector growth by union, full-file-delete collapse, the
  * interplay with the copy-on-write operations (which must carry and
  * CLEAR vectors correctly), checkpointing with vectors + feature
  * lists, and the remaining writer refusals (legacy versions 3–6,
  * unknown version-7 features). */
class DeltaDvWriteSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft_dvw_").toString

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def dataFiles(root: String): Set[String] = {
    val walk = Files.walk(Paths.get(root))
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log"))
      .map(_.toString).toSet
    finally walk.close()
  }

  test("deleteWithDv: rows vanish, bytes stay, protocol upgrades, vectors grow") {
    import spark.implicits._
    val root = freshTable()
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2)
    DeltaWrite.create(spark, df, root)
    val before = dataFiles(root)
    val st0 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st0.minReader === 1L && st0.minWriter === 2L)

    // v1: two rows die — no data file is written, moved, or deleted
    val v1 = DeltaWrite.deleteWithDv(spark, root, col("id").isin(2L, 5L))
    assert(v1 === 1L)
    assert(ids(DeltaRead.read(spark, root)) ===
      Seq(1L, 3L, 4L, 6L, 7L, 8L, 9L, 10L))
    assert(dataFiles(root) === before, "a DV delete must not touch data files")

    // the same commit upgraded the protocol and preserved the metaData id
    val st1 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st1.minReader === 3L && st1.minWriter === 7L)
    assert(st1.readerFeatures === Set("deletionVectors"))
    assert(st1.writerFeatures ===
      Set("appendOnly", "deletionVectors", "invariants"))
    assert(st1.meta.configuration.get("delta.enableDeletionVectors")
      === Some("true"))
    assert(st1.meta.id === st0.meta.id)
    assert(st1.dvs.nonEmpty)

    // v2: the vectors GROW (union with the existing ones)
    val v2 = DeltaWrite.deleteWithDv(spark, root, col("id") === 3L)
    assert(v2 === 2L)
    assert(ids(DeltaRead.read(spark, root)) ===
      Seq(1L, 4L, 6L, 7L, 8L, 9L, 10L))
    // no second protocol action needed; still one live DV per path
    val st2 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st2.dvs.values.map(_.cardinality).sum === 3L)

    // time travel reads every version as committed
    assert(ids(DeltaRead.read(spark, root, 0)) === (1L to 10L))
    assert(ids(DeltaRead.read(spark, root, 1)) ===
      Seq(1L, 3L, 4L, 6L, 7L, 8L, 9L, 10L))

    // a no-match delete commits nothing
    assert(DeltaWrite.deleteWithDv(spark, root, col("id") === 999L) === 2L)
    assert(DeltaRead.latestVersion(root) === 2L)
  }

  test("a DV-carrying add marks its stats tightBounds:false, numRecords physical") {
    // ADVICE r14: absent tightBounds defaults to TRUE, so a foreign
    // reader would answer MIN/MAX from bounds still including deleted
    // rows — the protocol's DV writer requirements mandate false
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    DeltaWrite.deleteWithDv(spark, root, col("id") === 5L)
    val line = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${1L}%020d.json")).asScala
      .find(_.contains("\"add\"")).get
    val add = graft.util.Json.get(graft.util.Json.parse(line), "add")
    val stats = graft.util.Json.parse(
      graft.util.Json.str(add, "stats").get)
    assert(graft.util.Json.get(stats, "tightBounds") ===
      java.lang.Boolean.FALSE)
    // numRecords stays PHYSICAL (5 rows in the file, 1 hidden)
    assert(graft.util.Json.long(stats, "numRecords") === Some(5L))
    // min/max survive as non-tight bounds
    assert(graft.util.Json.long(stats, "minValues", "id") === Some(1L))
    // and the reader still folds/reads the table fine
    assert(ids(DeltaRead.read(spark, root)) === (1L to 4L))
  }

  test("a fully-deleted file is removed outright, not wrapped in a full DV") {
    import spark.implicits._
    val root = freshTable()
    val df = (1L to 6L).map(i => (i, i <= 3L)).toDF("id", "low")
    DeltaWrite.create(spark, df, root, partitionBy = Seq("low"))
    DeltaWrite.deleteWithDv(spark, root, col("low") === true)
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    assert(ids(DeltaRead.read(spark, root)) === Seq(4L, 5L, 6L))
    // the low=true file left the live set entirely; no vector shell
    assert(st.live.forall(!_._1.contains("low=true")))
    assert(st.dvs.isEmpty)
    // no vector was written, so the one-way protocol bump must NOT
    // have happened — the table stays writable by (1,2) engines
    assert(st.minReader === 1L && st.minWriter === 2L)
  }

  test("copy-on-write ops on a DV table: delete clears vectors, overwrite carries them away, append just works") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    assert(DeltaRead.state(spark, root, Long.MaxValue).dvs.nonEmpty)

    // append: new file, vectors untouched
    DeltaWrite.append(spark, Seq((9L, "v9")).toDF("id", "v"), root)
    assert(ids(DeltaRead.read(spark, root)) ===
      Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))

    // CoW delete on the DV'd file: survivors = visible rows minus the
    // match — the rewrite clears the vector
    DeltaWrite.delete(spark, root, col("id") === 3L)
    val afterCow = DeltaRead.state(spark, root, Long.MaxValue)
    assert(ids(DeltaRead.read(spark, root)) ===
      Seq(1L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(afterCow.dvs.isEmpty, "the rewrite must clear the file's vector")

    // overwrite: replaces everything; the folded live set is exactly
    // the new file (the removes carried the (path, dv) identities)
    DeltaWrite.deleteWithDv(spark, root, col("id") === 4L)
    DeltaWrite.overwrite(spark, Seq((100L, "x")).toDF("id", "v"), root)
    assert(ids(DeltaRead.read(spark, root)) === Seq(100L))
    assert(DeltaRead.state(spark, root, Long.MaxValue).dvs.isEmpty)
  }

  test("checkpoint carries vectors and feature lists; bootstrap survives a vacuumed log") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    DeltaWrite.append(spark, Seq((7L, "v7")).toDF("id", "v"), root,
      txn = Some(("app-dv", 41L)))
    DeltaWrite.deleteWithDv(spark, root, col("id").isin(1L, 6L))
    val cpV = DeltaWrite.checkpoint(spark, root)
    assert(cpV === 2L)
    // vacuum every JSON commit the checkpoint covers
    (0L to 2L).foreach(v =>
      Files.delete(Paths.get(root, "_delta_log", f"$v%020d.json")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(2L, 3L, 4L, 5L, 7L))
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st.minReader === 3L && st.minWriter === 7L)
    assert(st.readerFeatures === Set("deletionVectors"))
    assert(st.txns.get("app-dv") === Some(41L))
    assert(st.dvs.nonEmpty)
    // and the table keeps working on top of the bootstrap
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    assert(ids(DeltaRead.read(spark, root)) === Seq(3L, 4L, 5L, 7L))
  }

  test("syncDelta applies a deleteWithDv commit to the imported GraftTable") {
    import spark.implicits._
    val root = freshTable()
    val gt = Files.createTempDirectory("graft_dvw_gt_").toString
    DeltaWrite.create(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    GraftTable.importDelta(spark, root, gt, "id", 2)
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    val applied = GraftTable.syncDelta(spark, gt)
    assert(applied.map(_._1) === Seq(1L))
    assert(applied.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L, 3L, 4L, 5L))
  }

  test("purgeVectors rewrites DV'd files clean with dataChange=false; threshold honored") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    DeltaWrite.append(spark, Seq((9L, "v9")).toDF("id", "v"), root)
    DeltaWrite.deleteWithDv(spark, root, col("id").isin(2L, 3L))
    val before = ids(DeltaRead.read(spark, root))

    val v = DeltaWrite.purgeVectors(spark, root)
    assert(v === 3L)
    assert(ids(DeltaRead.read(spark, root)) === before,
      "purge must not change logical content")
    assert(DeltaRead.state(spark, root, Long.MaxValue).dvs.isEmpty)
    // every action in the purge commit declares dataChange=false
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
      .filter(l => l.contains("\"add\"") || l.contains("\"remove\""))
    assert(lines.nonEmpty &&
      lines.forall(_.contains("\"dataChange\":false")))

    // a vector under the density threshold is left alone
    DeltaWrite.deleteWithDv(spark, root, col("id") === 4L) // 1 of 6 rows
    val vSame = DeltaWrite.purgeVectors(spark, root, minDeletedFraction = 0.5)
    assert(vSame === 4L, "no commit when nothing clears the threshold")
    assert(DeltaRead.state(spark, root, Long.MaxValue).dvs.nonEmpty)
  }

  test("a legacy (2,5) mapped+CDF table's DV upgrade carries the " +
      "in-use features (review r15)") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v"), root,
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    // rewrite commit 0's protocol to the LEGACY bundle form a real
    // pre-table-features writer would have left — no feature lists
    val p0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    val rewritten = Files.readAllLines(p0).asScala.map(l =>
      if (l.contains("\"protocol\""))
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
      else l)
    Files.writeString(p0, rewritten.mkString("\n") + "\n")
    val st0 = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st0.minReader === 2L && st0.minWriter === 5L &&
      st0.writerFeatures.isEmpty)

    // the DV upgrade must NOT strip the mapping/CDF contracts the
    // table actively uses — a (3,7) protocol that stopped naming
    // columnMapping would let a conformant writer emit logically-
    // named files into a physically-mapped table
    DeltaWrite.deleteWithDv(spark, root, col("id") === 2L)
    val st = DeltaRead.state(spark, root, Long.MaxValue)
    assert(st.minReader === 3L && st.minWriter === 7L)
    assert(st.readerFeatures === Set("columnMapping", "deletionVectors"))
    assert(st.writerFeatures === Set("appendOnly", "changeDataFeed",
      "columnMapping", "deletionVectors", "invariants"))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 3L, 4L))
    // and the commit's change files are mapped-conformant: the CDF
    // read returns the deleted row through the cdc branch
    val feed = DeltaRead.readChanges(spark, root, 1L, 1L)
    assert(feed.where(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("writer refusals: legacy versions 3-6 and unknown version-7 features, by name") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val log = Paths.get(root, "_delta_log")
    def protoCommit(v: Long, body: String): Unit =
      Files.writeString(log.resolve(f"$v%020d.json"),
        s"""{"protocol":$body}\n""")

    // unknown writer versions (>7) refuse outright; legacy 3-6 gates
    // (write iff the bundled features are provably unused) live in
    // DeltaMappedWriteSpec
    protoCommit(1L, """{"minReaderVersion":1,"minWriterVersion":8}""")
    val legacy = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    }
    assert(legacy.getMessage.contains("minWriterVersion=8"))

    protoCommit(2L,
      """{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["typeWidening"]}""")
    val unknown = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    }
    assert(unknown.getMessage.contains("typeWidening"))

    protoCommit(3L, """{"minReaderVersion":1,"minWriterVersion":7}""")
    val bare = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    }
    assert(bare.getMessage.contains("no writerFeatures"))
  }
}
