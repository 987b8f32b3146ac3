package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeltaRead, GraftTable}

/** Incremental Delta→GraftTable CDC sync (VERDICT r12 #1 — the
  * promised second half of the importDelta migration path): a live
  * Delta writer keeps committing versions N+1..N+k and [[GraftTable
  * .syncDelta]] must keep the imported table SNAPSHOT-EQUAL to
  * `DeltaRead.read(deltaRoot, v)` at EVERY v — copy-on-write updates,
  * appends, whole-file deletes, re-adds after delete, metadata-only
  * commits, partitioned tables — with crash-replay idempotence (a
  * marker that lost the race with its merge re-applies harmlessly)
  * and loud refusals (protocol bump mid-stream, schema change,
  * duplicate merge keys) that leave the table consistent at the last
  * synced version. Equality is checked as a full multiset identity
  * (exceptAll both ways — strictly stronger than the
  * q_table_fingerprint fold at this scale). */
class DeltaSyncSpec extends SparkSpec {

  // ---- hand-authored Delta writer (the PROTOCOL.md fixtures of
  // DeltaReadSpec, reused shape) --------------------------------------

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    Files.move(part, Paths.get(root, name), StandardCopyOption.REPLACE_EXISTING)
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  private def writeCommit(root: String, v: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(root, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def protoLine(v: Int = 1) =
    s"""{"protocol":{"minReaderVersion":$v,"minWriterVersion":2}}"""

  private def metaLine(schemaJson: String, partCols: Seq[String] = Nil) =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partCols.map(c => s""""$c"""").mkString(",")}],""" +
      s""""configuration":{},"createdTime":0}}"""

  private def addLine(path: String, pv: String = "{}") =
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":1,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  private def removeLine(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

  private def assertMirrors(gt: String, deltaRoot: String, v: Int): Unit = {
    val want = DeltaRead.read(spark, deltaRoot, v)
    val got = GraftTable.read(spark, gt)
    val missing = want.exceptAll(got)
    val extra = got.exceptAll(want)
    assert(missing.isEmpty && extra.isEmpty,
      s"GraftTable diverged from Delta@v$v: missing=" +
        s"${missing.collect().take(3).mkString(",")} extra=" +
        s"${extra.collect().take(3).mkString(",")}")
  }

  test("sync mirrors every Delta version: update, append, delete, re-add, metadata-only") {
    import spark.implicits._
    val deltaRoot = Files.createTempDirectory("graft_dsync_").toString
    val gt = Files.createTempDirectory("graft_dsync_gt_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema.json

    // v0: the imported base — f1 = {1,2,3}, f2 = {4,5,6}
    dataFile(deltaRoot, "f1.parquet",
      Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("id", "v"))
    dataFile(deltaRoot, "f2.parquet",
      Seq((4L, "a4"), (5L, "a5"), (6L, "a6")).toDF("id", "v"))
    writeCommit(deltaRoot, 0, Seq(protoLine(), metaLine(schema),
      addLine("f1.parquet"), addLine("f2.parquet")))
    GraftTable.importDelta(spark, deltaRoot, gt, "id", 2)
    assert(GraftTable.deltaSyncState(gt) === Some((deltaRoot, 0L)))
    assertMirrors(gt, deltaRoot, 0)

    // v1: copy-on-write update — f2 rewritten as f2b: id 4 changed,
    // id 5 kept verbatim, id 6 DROPPED (row-level delete via CoW)
    dataFile(deltaRoot, "f2b.parquet",
      Seq((4L, "B4"), (5L, "a5")).toDF("id", "v"))
    writeCommit(deltaRoot, 1, Seq(removeLine("f2.parquet"), addLine("f2b.parquet")))
    // v2: append
    dataFile(deltaRoot, "f3.parquet",
      Seq((7L, "c7"), (8L, "c8")).toDF("id", "v"))
    writeCommit(deltaRoot, 2, Seq(addLine("f3.parquet")))
    // v3: whole-file delete
    writeCommit(deltaRoot, 3, Seq(removeLine("f1.parquet")))
    // v4: RE-ADD of the deleted file (same path, same bytes)
    writeCommit(deltaRoot, 4, Seq(addLine("f1.parquet")))
    // v5: metadata-only commit — no file change, marker must advance
    writeCommit(deltaRoot, 5, Seq("""{"commitInfo":{"operation":"OPTIMIZE"}}"""))

    // drain the ladder; the sync applies one GraftTable commit per
    // DATA-CHANGING Delta version IN ORDER (v5 only moves the marker)
    val applied = GraftTable.syncDelta(spark, gt)
    assert(applied.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(GraftTable.deltaSyncState(gt).get._2 === 5L)
    assertMirrors(gt, deltaRoot, 5)
    // snapshot-equal at EVERY version: GraftTable time travel replays
    // the ladder rung for rung (gt version dv+1 mirrors delta dv)
    (0 to 4).foreach { dv =>
      val want = DeltaRead.read(spark, deltaRoot, dv)
      val got = GraftTable.read(spark, gt, dv + 1)
      assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty,
        s"GraftTable version ${dv + 1} != Delta version $dv")
    }
    // second sync: nothing new — no-op, no churn
    assert(GraftTable.syncDelta(spark, gt).isEmpty)
    val versionAfter = GraftTable.currentVersion(gt)

    // crash-replay idempotence: the marker lost the race with the last
    // merge (crash between commit and marker write) — re-applying the
    // replayed version must not duplicate or lose rows
    Files.writeString(Paths.get(gt, "delta_sync.json"),
      s"""{"deltaRoot":"$deltaRoot","version":3}""")
    val reapplied = GraftTable.syncDelta(spark, gt)
    assert(reapplied.map(_._1) === Seq(4L))
    assertMirrors(gt, deltaRoot, 5)
    assert(GraftTable.currentVersion(gt) === versionAfter + 1)

    // protocol bump mid-stream: refuse BEFORE applying, table stays
    // consistent at the last synced version
    dataFile(deltaRoot, "f4.parquet", Seq((9L, "d9")).toDF("id", "v"))
    writeCommit(deltaRoot, 6, Seq(protoLine(v = 3), addLine("f4.parquet")))
    val e = intercept[IllegalArgumentException] { GraftTable.syncDelta(spark, gt) }
    assert(e.getMessage.contains("minReaderVersion=3"))
    assert(GraftTable.deltaSyncState(gt).get._2 === 5L)
    assertMirrors(gt, deltaRoot, 5)
  }

  test("sync carries partition values through updates and deletes") {
    import spark.implicits._
    val deltaRoot = Files.createTempDirectory("graft_dsyncp_").toString
    val gt = Files.createTempDirectory("graft_dsyncp_gt_").toString
    // partition column p is NOT in the data files — its values ride
    // the log, and the v−1 fold must supply them for REMOVED files
    val schema = Seq((0L, "x", 0)).toDF("id", "v", "p").schema.json
    dataFile(deltaRoot, "f1.parquet", Seq((1L, "a1"), (2L, "a2")).toDF("id", "v"))
    dataFile(deltaRoot, "f2.parquet", Seq((3L, "a3")).toDF("id", "v"))
    writeCommit(deltaRoot, 0, Seq(protoLine(), metaLine(schema, Seq("p")),
      addLine("f1.parquet", """{"p":"10"}"""),
      addLine("f2.parquet", """{"p":"20"}""")))
    GraftTable.importDelta(spark, deltaRoot, gt, "id", 2)

    // v1: rewrite partition 10 — id 1 changes value, id 2 deleted
    dataFile(deltaRoot, "f1b.parquet", Seq((1L, "B1")).toDF("id", "v"))
    writeCommit(deltaRoot, 1, Seq(removeLine("f1.parquet"),
      addLine("f1b.parquet", """{"p":"10"}""")))
    GraftTable.syncDelta(spark, gt)
    assertMirrors(gt, deltaRoot, 1)
    val got = GraftTable.read(spark, gt).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, "B1", 10), (3L, "a3", 20)))
  }

  test("refuses schema changes and duplicate merge keys mid-sync") {
    import spark.implicits._
    val deltaRoot = Files.createTempDirectory("graft_dsyncr_").toString
    val gt = Files.createTempDirectory("graft_dsyncr_gt_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema.json
    dataFile(deltaRoot, "f1.parquet", Seq((1L, "a1")).toDF("id", "v"))
    writeCommit(deltaRoot, 0, Seq(protoLine(), metaLine(schema),
      addLine("f1.parquet")))
    GraftTable.importDelta(spark, deltaRoot, gt, "id", 1)

    // schema change mid-stream (new column) — refuse, don't half-apply
    val schema2 = Seq((0L, "x", 0.0)).toDF("id", "v", "w").schema.json
    writeCommit(deltaRoot, 1, Seq(metaLine(schema2), addLine("f1.parquet")))
    val e = intercept[IllegalArgumentException] { GraftTable.syncDelta(spark, gt) }
    assert(e.getMessage.contains("changes the table schema"))
    assertMirrors(gt, deltaRoot, 0)

    // duplicate merge keys within one commit — refuse loudly
    val deltaRoot2 = Files.createTempDirectory("graft_dsyncd_").toString
    val gt2 = Files.createTempDirectory("graft_dsyncd_gt_").toString
    dataFile(deltaRoot2, "f1.parquet", Seq((1L, "a1")).toDF("id", "v"))
    writeCommit(deltaRoot2, 0, Seq(protoLine(), metaLine(schema),
      addLine("f1.parquet")))
    GraftTable.importDelta(spark, deltaRoot2, gt2, "id", 1)
    dataFile(deltaRoot2, "dup.parquet",
      Seq((7L, "x1"), (7L, "x2")).toDF("id", "v"))
    writeCommit(deltaRoot2, 1, Seq(addLine("dup.parquet")))
    val e2 = intercept[IllegalArgumentException] { GraftTable.syncDelta(spark, gt2) }
    assert(e2.getMessage.contains("duplicate merge keys"))
  }
}
