package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeltaRead, DeltaWrite}
import graft.util.Json

/** [[DeltaWrite.vacuum]] — retention-respecting physical file GC
  * (VERDICT r14 gap 5) — proven end to end: unreferenced files past
  * the horizon are reclaimed while live data, live deletion vectors,
  * and retained tombstones survive; reads stay green at every LIVE
  * version; time travel past the horizon and readChanges over a
  * vacuumed range refuse BY NAME; the deletion-marker protocol
  * (VACUUM START / VACUUM END commitInfo commits) brackets the
  * deletes and stays inert for every reader; [[DeltaWrite.cleanLog]]
  * truncates the log below the newest checkpoint. */
class DeltaVacuumSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft_vac_").toString

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def tableFiles(root: String): Set[String] = {
    val walk = Files.walk(Paths.get(root))
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.toString.contains("_delta_log"))
      .map(_.toString).toSet
    finally walk.close()
  }

  private def commitJson(root: String, v: Long): Seq[Any] =
    Files.readAllLines(
        Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
      .filter(_.trim.nonEmpty).map(Json.parse).toSeq

  test("vacuum reclaims unreferenced files; live versions read; " +
      "time travel past the horizon refuses by name") {
    import spark.implicits._
    val root = freshTable()
    val df0 = (1L to 10L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
    DeltaWrite.create(spark, df0, root, partitionBy = Seq("p")) // v0
    DeltaWrite.overwrite(spark,
      (11L to 14L).map(i => (i, "p0")).toDF("id", "p"), root) // v1

    // inside the window nothing is reclaimable: v0's files are young
    val young = DeltaWrite.vacuum(spark, root)
    assert(young.filesDeleted === 0L)
    assert(ids(DeltaRead.read(spark, root, 0)) === (1L to 10L)) // still live

    // dry run at horizon 0: counts v0's orphans, deletes nothing,
    // commits nothing
    val preDry = tableFiles(root)
    val latestPre = DeltaRead.latestVersion(root)
    val dry = DeltaWrite.vacuum(spark, root, retentionMs = 0L,
      dryRun = true, retentionCheck = false)
    assert(dry.dryRun && dry.filesDeleted > 0L && dry.bytesDeleted > 0L)
    assert(tableFiles(root) === preDry)
    assert(DeltaRead.latestVersion(root) === latestPre)

    // the real vacuum: v0's orphaned partition files go; the p1=…
    // directory empties and is removed too
    val st = DeltaWrite.vacuum(spark, root, retentionMs = 0L,
      retentionCheck = false)
    assert(st.filesDeleted === dry.filesDeleted &&
      st.bytesDeleted === dry.bytesDeleted)
    assert(st.dirsDeleted >= 1L, "the emptied p=p1 dir must be removed")
    assert(!Files.isDirectory(Paths.get(root, "p=p1")))

    // current version still green
    assert(ids(DeltaRead.read(spark, root)) === Seq(11L, 12L, 13L, 14L))
    // v1 (the data-latest, all files live) still time-travels green
    assert(ids(DeltaRead.read(spark, root, 1)) === Seq(11L, 12L, 13L, 14L))
    // v0 refuses BY NAME, not a lazy scan-time FileNotFound
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, root, 0).collect()
    }
    assert(e.getMessage.contains("VACUUM") &&
      e.getMessage.contains("retention horizon"))

    // the deletion-marker protocol: VACUUM START then VACUUM END,
    // commitInfo-only, with the spec'd parameters and metrics
    val vEnd = DeltaRead.latestVersion(root)
    val startActions = commitJson(root, vEnd - 1)
    val endActions = commitJson(root, vEnd)
    assert(startActions.size === 1 && endActions.size === 1)
    val ci0 = Json.get(startActions.head, "commitInfo")
    assert(Json.str(ci0, "operation").contains("VACUUM START"))
    assert(Json.get(ci0, "operationParameters", "retentionCheckEnabled")
      === java.lang.Boolean.FALSE)
    assert(Json.long(ci0, "operationParameters", "specifiedRetentionMillis")
      .contains(0L))
    assert(Json.long(ci0, "operationMetrics", "numFilesToDelete")
      .contains(st.filesDeleted))
    val ci1 = Json.get(endActions.head, "commitInfo")
    assert(Json.str(ci1, "operation").contains("VACUUM END"))
    assert(Json.str(ci1, "operationParameters", "status").contains("COMPLETED"))
    assert(Json.long(ci1, "operationMetrics", "numDeletedFiles")
      .contains(st.filesDeleted))
    // marker commits are inert: the fold and a follow-up write both
    // sail through them
    DeltaWrite.append(spark, Seq((15L, "p0")).toDF("id", "p"), root)
    assert(ids(DeltaRead.read(spark, root)) === Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("retention check refuses sub-horizon vacuums; table property " +
      "overrides the default") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark, (1L to 3L).map(i => (i, i)).toDF("id", "n"), root)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.vacuum(spark, root, retentionMs = 1000L)
    }
    assert(e.getMessage.contains("shorter than the table's retention"))

    // a table that CONFIGURES a 1-second retention accepts it
    val root2 = freshTable()
    DeltaWrite.create(spark, (1L to 3L).map(i => (i, i)).toDF("id", "n"),
      root2, configuration =
        Map("delta.deletedFileRetentionDuration" -> "interval 1 second"))
    val st = DeltaWrite.vacuum(spark, root2, retentionMs = 1000L)
    assert(st.filesDeleted === 0L) // nothing orphaned — but no refusal
    assert(DeltaWrite.parseIntervalMs("interval 2 weeks") ===
      14L * 24 * 3600 * 1000)
    intercept[RuntimeException] {
      DeltaWrite.parseIntervalMs("2 fortnights")
    }
  }

  test("live deletion vectors survive; purged vectors are reclaimed; " +
      "a recent tombstone shields an old file") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v"), root)
    DeltaWrite.deleteWithDv(spark, root, col("id").isin(2L, 5L))
    val dvFiles = tableFiles(root).filter(_.contains("deletion_vector"))
    assert(dvFiles.size === 1)

    // the DV is live — vacuum at horizon 0 must keep it AND the data
    val st1 = DeltaWrite.vacuum(spark, root, retentionMs = 0L,
      retentionCheck = false)
    assert(st1.filesDeleted === 0L)
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 3L, 4L, 6L, 7L, 8L))

    // purge rewrites to clean parquet — the vector and the old data
    // file become orphans and the next vacuum reclaims both
    val vPurge = DeltaWrite.purgeVectors(spark, root)
    val st2 = DeltaWrite.vacuum(spark, root, retentionMs = 0L,
      retentionCheck = false)
    assert(st2.filesDeleted >= 2L) // old data file(s) + the DV file
    assert(tableFiles(root).forall(!_.contains("deletion_vector")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 3L, 4L, 6L, 7L, 8L))
    // the pre-purge version referenced the reclaimed vector — by name
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, root, vPurge.toInt - 1).collect()
    }
    assert(e.getMessage.contains("VACUUM"))

    // a RECENT tombstone shields its file even when the file's mtime
    // is ancient: overwrite now, backdate the orphan, vacuum with a
    // 1-day window — the tombstone's deletionTimestamp is inside it
    val root2 = freshTable()
    DeltaWrite.create(spark, (1L to 4L).map(i => (i, i)).toDF("id", "n"), root2)
    val orphans = tableFiles(root2)
    DeltaWrite.overwrite(spark, Seq((9L, 9L)).toDF("id", "n"), root2)
    val old = FileTime.fromMillis(
      System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    orphans.foreach(p => Files.setLastModifiedTime(Paths.get(p), old))
    val shielded = DeltaWrite.vacuum(spark, root2,
      retentionMs = 24L * 3600 * 1000, retentionCheck = false)
    assert(shielded.filesDeleted === 0L,
      "a tombstone inside the window shields its old-mtime file")
    assert(ids(DeltaRead.read(spark, root2, 0)) === (1L to 4L))
    // past the tombstone's window it goes
    val gone = DeltaWrite.vacuum(spark, root2, retentionMs = 0L,
      retentionCheck = false)
    assert(gone.filesDeleted === orphans.size.toLong)
  }

  test("an aged crashed staging dir is reclaimed; a young one survives " +
      "(review r15)") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val crashed = Paths.get(root, ".graft-stage-deadbeef")
    Files.createDirectories(crashed)
    Files.writeString(crashed.resolve("part-0.parquet"), "junk")
    val young = Paths.get(root, ".graft-stage-cafebabe")
    Files.createDirectories(young)
    Files.writeString(young.resolve("part-0.parquet"), "junk")
    val old = FileTime.fromMillis(
      System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    Files.setLastModifiedTime(crashed.resolve("part-0.parquet"), old)

    val st = DeltaWrite.vacuum(spark, root,
      retentionMs = 24L * 3600 * 1000, retentionCheck = false)
    assert(st.filesDeleted === 1L)
    assert(!Files.exists(crashed), "aged crash residue reclaimed, dir too")
    assert(Files.exists(young.resolve("part-0.parquet")),
      "an in-flight stage inside the window survives")
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L))
  }

  test("change-data files are reclaimed and readChanges refuses the " +
      "vacuumed range by name") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"), root,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.delete(spark, root, col("id") <= 2L) // v1: cdc files
    val feed = DeltaRead.readChanges(spark, root, 1L, 1L)
    assert(feed.where(col("_change_type") === "delete").count() === 2L)
    assert(tableFiles(root).exists(_.contains("_change_data")))

    val st = DeltaWrite.vacuum(spark, root, retentionMs = 0L,
      retentionCheck = false)
    assert(st.filesDeleted >= 2L) // the cdc file + v0's rewritten file
    assert(tableFiles(root).forall(p => !p.contains("_change_data")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(3L, 4L, 5L, 6L))

    // the cdc-backed commit refuses on its vacuumed change file…
    val e1 = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, root, 1L, 1L).collect()
    }
    assert(e1.getMessage.contains("change-data file") &&
      e1.getMessage.contains("VACUUM"))
    // …and the derivation branch refuses on v0's vacuumed add files
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, root, 0L, 0L).collect()
    }
    assert(e2.getMessage.contains("removed by VACUUM"))
  }

  test("cleanLog truncates commits below the newest checkpoint; " +
      "bootstrap and refusals stay correct") {
    import spark.implicits._
    val root = freshTable()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root) // v1
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root) // v2
    DeltaWrite.checkpoint(spark, root) // checkpoint @ v2
    DeltaWrite.append(spark, Seq((4L, "d")).toDF("id", "v"), root) // v3

    // young log: nothing truncated at the default retention
    assert(DeltaWrite.cleanLog(spark, root) === 0)
    // horizon 0: v0 and v1 JSONs go, the checkpoint + tail survive
    assert(DeltaWrite.cleanLog(spark, root, logRetentionMs = 0L) === 2)
    val log = Paths.get(root, "_delta_log")
    assert(!Files.exists(log.resolve(f"${0L}%020d.json")))
    assert(Files.exists(log.resolve(f"${2L}%020d.json")))

    // reads bootstrap from the checkpoint, whole table intact
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L, 3L, 4L))
    // readChanges over the truncated range refuses by name
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, root, 0L, 3L)
    }
    assert(e.getMessage.contains("vacuumed"))
    // the surviving range still serves
    assert(DeltaRead.readChanges(spark, root, 3L, 3L).count() === 1L)
  }
}
