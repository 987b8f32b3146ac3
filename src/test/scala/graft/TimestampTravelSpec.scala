package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

import graft.sources.{DeltaRead, DeltaWrite, GraftTable, IcebergRead, IcebergWrite}
import graft.util.Json

/** Timestamp-based time travel on BOTH lakehouse readers (VERDICT
  * r14 gap 6): `readAsOf` resolves "the table as it was at time T" to
  * the last commit/snapshot at-or-before T, and `readChangesAsOf`
  * feeds the change feed by a time window. Boundary semantics pinned
  * both formats: a timestamp EQUAL to a commit's resolves to that
  * commit (inclusive as-of); one before the earliest surviving
  * commit/oldest ancestor refuses by name; Delta's
  * `inCommitTimestamp` beats file mtime; non-monotonic raw clocks are
  * adjusted strictly increasing so resolution is well-ordered. */
class TimestampTravelSpec extends SparkSpec {

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def setCommitTime(root: String, v: Long, ts: Long): Unit =
    Files.setLastModifiedTime(
      Paths.get(root, "_delta_log", f"$v%020d.json"), FileTime.fromMillis(ts))

  test("Delta readAsOf: mtime resolution, inclusive boundary, " +
      "too-early refusal") {
    import spark.implicits._
    val root = fresh("graft_tt_delta_")
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root) // v1
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root) // v2
    val now = System.currentTimeMillis()
    val (t0, t1, t2) = (now - 30000, now - 20000, now - 10000)
    setCommitTime(root, 0, t0)
    setCommitTime(root, 1, t1)
    setCommitTime(root, 2, t2)

    assert(DeltaRead.versionAsOf(root, t0) === 0L) // exact = inclusive
    assert(DeltaRead.versionAsOf(root, t1 - 1) === 0L)
    assert(DeltaRead.versionAsOf(root, t1) === 1L)
    assert(DeltaRead.versionAsOf(root, now) === 2L)
    assert(ids(DeltaRead.readAsOf(spark, root, t1)) === Seq(1L, 2L))
    assert(ids(DeltaRead.readAsOf(spark, root, now)) === Seq(1L, 2L, 3L))

    val e = intercept[IllegalArgumentException] {
      DeltaRead.readAsOf(spark, root, t0 - 1)
    }
    assert(e.getMessage.contains("precedes the earliest surviving commit"))
  }

  test("Delta: inCommitTimestamp beats mtime; clock skew is adjusted " +
      "monotonic") {
    import spark.implicits._
    val root = fresh("graft_tt_ict_")
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root) // v1
    val now = System.currentTimeMillis()
    setCommitTime(root, 0, now - 30000)
    setCommitTime(root, 1, now - 20000)

    // v1 carries an inCommitTimestamp far from its mtime — it wins
    val ict = now - 5000
    val p1 = Paths.get(root, "_delta_log", f"${1L}%020d.json")
    val line = Json.render(Map("commitInfo" -> Map(
      "operation" -> "WRITE", "inCommitTimestamp" -> ict))) + "\n"
    Files.writeString(p1, line + Files.readString(p1),
      StandardOpenOption.TRUNCATE_EXISTING)
    setCommitTime(root, 1, now - 20000) // restore mtime after rewrite
    assert(DeltaRead.versionAsOf(root, now - 20000) === 0L,
      "v1's mtime must be ignored when inCommitTimestamp is present")
    assert(DeltaRead.versionAsOf(root, ict) === 1L)

    // skew: a commit whose raw time runs BACKWARD inherits prev+1
    val root2 = fresh("graft_tt_skew_")
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root2) // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root2) // v1
    setCommitTime(root2, 0, now - 10000)
    setCommitTime(root2, 1, now - 30000) // earlier than v0 — skewed
    assert(DeltaRead.versionAsOf(root2, now - 10000) === 0L)
    assert(DeltaRead.versionAsOf(root2, now - 10000 + 1) === 1L,
      "skewed v1 resolves at v0's adjusted time + 1")
  }

  test("Delta readChangesAsOf: window semantics, from-the-beginning, " +
      "empty window") {
    import spark.implicits._
    val root = fresh("graft_tt_cdf_")
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root) // v1
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root) // v2
    val now = System.currentTimeMillis()
    val (t0, t1, t2) = (now - 30000, now - 20000, now - 10000)
    setCommitTime(root, 0, t0)
    setCommitTime(root, 1, t1)
    setCommitTime(root, 2, t2)

    // (t0, t2]: v1 and v2's inserts; v0 (on the FROM boundary) excluded
    val mid = DeltaRead.readChangesAsOf(spark, root, t0, t2)
    assert(ids(mid) === Seq(2L, 3L))
    // fromTs before the first commit = from the beginning
    assert(ids(DeltaRead.readChangesAsOf(spark, root, t0 - 5000, now)) ===
      Seq(1L, 2L, 3L))
    // a window with no commit inside: empty frame, change schema intact
    val empty = DeltaRead.readChangesAsOf(spark, root, t2 + 1, t2 + 2)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("id", "v", "_change_type", "_commit_version"))
  }

  test("GraftTable readAsOf: manifest-mtime resolution with the same " +
      "boundary semantics") {
    import spark.implicits._
    val root = fresh("graft_tt_gt_") + "/t"
    GraftTable.create(spark, root,
      Seq((1L, "a")).toDF("id", "v"), "id", 1) // v1
    GraftTable.merge(spark, root,
      Seq((2L, false, "b")).toDF("id", "is_delete", "new_v")) // v2
    val now = System.currentTimeMillis()
    val (t1, t2) = (now - 30000, now - 10000)
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(root, "manifest", "v1.json"),
      java.nio.file.attribute.FileTime.fromMillis(t1))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(root, "manifest", "v2.json"),
      java.nio.file.attribute.FileTime.fromMillis(t2))

    assert(GraftTable.versionAsOf(root, t1) === 1) // exact = inclusive
    assert(GraftTable.versionAsOf(root, t2 - 1) === 1)
    assert(GraftTable.versionAsOf(root, now) === 2)
    assert(ids(GraftTable.read(spark, root, 1)) === Seq(1L))
    assert(ids(GraftTable.readAsOf(spark, root, t1)) === Seq(1L))
    val e = intercept[IllegalArgumentException] {
      GraftTable.readAsOf(spark, root, t1 - 1)
    }
    assert(e.getMessage.contains("precedes the earliest surviving version"))
  }

  test("Iceberg readAsOf + readChangesAsOf over the ancestry chain") {
    import spark.implicits._
    val root = fresh("graft_tt_ice_")
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    Thread.sleep(5)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    Thread.sleep(5)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)

    // the snapshots' own timestamps, from the metadata document
    val meta = Json.parse(Files.readString(Paths.get(root, "metadata",
      s"v${Files.readString(Paths.get(root, "metadata", "version-hint.text")).trim}.metadata.json")))
    val byId = Json.list(meta, "snapshots").map(s =>
      Json.long(s, "snapshot-id").get -> Json.long(s, "timestamp-ms").get).toMap
    val (ts1, ts2, ts3) = (byId(1L), byId(2L), byId(3L))
    assert(ts1 < ts2 && ts2 < ts3) // the sleeps made them distinct

    assert(IcebergRead.snapshotAsOf(root, ts1) === 1L) // exact = inclusive
    assert(IcebergRead.snapshotAsOf(root, ts2 - 1) === 1L)
    assert(IcebergRead.snapshotAsOf(root, ts2) === 2L)
    assert(IcebergRead.snapshotAsOf(root, System.currentTimeMillis()) === 3L)
    assert(ids(IcebergRead.readAsOf(spark, root, ts2)) === Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      IcebergRead.readAsOf(spark, root, ts1 - 1)
    }
    assert(e.getMessage.contains("precedes the oldest ancestor"))

    // change feed by window: (ts1, ts3] = snaps 2 and 3; the FROM
    // boundary excludes its snapshot, the TO boundary includes it
    val feed = IcebergRead.readChangesAsOf(spark, root, ts1, ts3)
      .select("_commit_snapshot_id", "_change_type", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(feed === Seq((2L, "insert", 2L), (3L, "insert", 3L)))
    assert(IcebergRead.readChangesAsOf(spark, root, ts2, ts3)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(3L))

    // from-the-beginning (review r15): a pre-history fromTs surfaces
    // the OLDEST snapshot's own rows as inserts — "all changes ever"
    val all = IcebergRead.readChangesAsOf(spark, root, 0L, ts3)
      .select("_commit_snapshot_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(all === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // a window entirely before history is EMPTY, not an error
    val pre = IcebergRead.readChangesAsOf(spark, root, ts1 - 10, ts1 - 5)
    assert(pre.count() === 0L)
    assert(pre.columns.contains("_commit_snapshot_id"))
  }

  test("Delta readChangesAsOf: a window entirely before history is " +
      "empty, not an error (review r15)") {
    import spark.implicits._
    val root = fresh("graft_tt_pre_")
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val now = System.currentTimeMillis()
    setCommitTime(root, 0, now - 10000)
    val empty = DeltaRead.readChangesAsOf(spark, root,
      now - 20000, now - 15000)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("id", "v", "_change_type", "_commit_version"))
  }
}
