package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{IcebergRead, IcebergWrite}

/** [[IcebergWrite.expireSnapshots]] + [[IcebergWrite
  * .removeOrphanFiles]] — Delta VACUUM's Iceberg twin (r15): expired
  * snapshots leave the metadata, files reachable ONLY from them are
  * physically reclaimed (manifest lists, manifests, data files),
  * surviving snapshots keep every byte they reference, time travel
  * past the horizon refuses, and the metadata-document ladder is
  * prunable. Orphan cleanup reclaims age-guarded unreferenced files
  * under data/. */
class IcebergMaintenanceSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_ice_exp_").toString

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def dataFiles(root: String): Set[String] = {
    val d = Paths.get(root, "data")
    if (!Files.isDirectory(d)) return Set.empty
    val ls = Files.list(d)
    try ls.iterator().asScala.map(_.toString).toSet finally ls.close()
  }

  private def metaFiles(root: String, re: String): Set[String] = {
    val ls = Files.list(Paths.get(root, "metadata"))
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches(re)).toSet
    finally ls.close()
  }

  test("expire reclaims only what surviving snapshots cannot reach; " +
      "time travel past the horizon refuses") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // s1
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root) // s2
    IcebergWrite.delete(spark, root, col("id") === 1L) // s3 (pos delete)
    val filesBefore = dataFiles(root)

    // retainLast=1, horizon 0: s1 and s2 expire; the current snapshot
    // carries every data file + the delete file by reference, so only
    // the expired snapshots' manifest LISTS go (their manifests are
    // all still reachable from s3's carried list)
    val st = IcebergWrite.expireSnapshots(root, olderThanMs = 0L)
    assert(st.expired === Seq(1L, 2L))
    assert(st.manifestListsDeleted === 2L)
    assert(st.dataFilesDeleted === 0L)
    assert(dataFiles(root) === filesBefore)
    assert(ids(IcebergRead.read(spark, root)) === Seq(2L))

    // expired history refuses by id…
    val e = intercept[RuntimeException] {
      IcebergRead.read(spark, root, 1L)
    }
    assert(e.getMessage.contains("snapshot 1 not found"))
    // …and the change feed across the expired boundary refuses too
    intercept[RuntimeException] {
      IcebergRead.readChanges(spark, root, 1L, 3L)
    }

    // writes continue on the expired table
    IcebergWrite.append(spark, Seq((9L, "z")).toDF("id", "v"), root)
    assert(ids(IcebergRead.read(spark, root)) === Seq(2L, 9L))
  }

  test("an overwritten snapshot's unreachable data files are deleted; " +
      "retainLast and the age horizon both shield") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root) // s1
    val gen1 = dataFiles(root)
    IcebergWrite.overwrite(spark, Seq((2L, "b")).toDF("id", "v"), root) // s2
    assert(gen1.subsetOf(dataFiles(root))) // bytes still on disk

    // a wide age horizon expires nothing
    assert(IcebergWrite.expireSnapshots(root,
      olderThanMs = 24L * 3600 * 1000).expired.isEmpty)
    // retainLast=2 keeps the whole chain regardless of age
    assert(IcebergWrite.expireSnapshots(root, olderThanMs = 0L,
      retainLast = 2).expired.isEmpty)

    // horizon 0, retainLast=1: s1 goes, and with it its now-
    // unreachable data file
    val st = IcebergWrite.expireSnapshots(root, olderThanMs = 0L)
    assert(st.expired === Seq(1L))
    assert(st.dataFilesDeleted === gen1.size.toLong)
    assert((dataFiles(root) intersect gen1).isEmpty)
    assert(ids(IcebergRead.read(spark, root)) === Seq(2L))
  }

  test("metadata-version pruning keeps the newest K documents") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    (2 to 5).foreach(i =>
      IcebergWrite.append(spark, Seq((i.toLong, "x")).toDF("id", "v"), root))
    assert(metaFiles(root, "v\\d+\\.metadata\\.json").size === 5)
    val st = IcebergWrite.expireSnapshots(root,
      olderThanMs = 365L * 24 * 3600 * 1000, maxMetadataVersions = 2)
    assert(st.expired.isEmpty && st.metadataFilesDeleted === 3L)
    assert(metaFiles(root, "v\\d+\\.metadata\\.json") ===
      Set("v4.metadata.json", "v5.metadata.json"))
    assert(ids(IcebergRead.read(spark, root)) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("orphan cleanup: age-guarded, reference-respecting") {
    import spark.implicits._
    val root = fresh()
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val live = dataFiles(root)
    val oldOrphan = Paths.get(root, "data", "crashed-stage.parquet")
    val newOrphan = Paths.get(root, "data", "inflight-stage.parquet")
    Files.writeString(oldOrphan, "junk")
    Files.writeString(newOrphan, "junk")
    Files.setLastModifiedTime(oldOrphan, FileTime.fromMillis(
      System.currentTimeMillis() - 10L * 24 * 3600 * 1000))

    assert(IcebergWrite.removeOrphanFiles(root) === 1L)
    assert(!Files.exists(oldOrphan), "an aged orphan is reclaimed")
    assert(Files.exists(newOrphan), "a young file may be an in-flight stage")
    assert(dataFiles(root).intersect(live) === live)
    assert(ids(IcebergRead.read(spark, root)) === Seq(1L))
    // referenced files never go, no matter the age
    live.foreach(p => Files.setLastModifiedTime(Paths.get(p),
      FileTime.fromMillis(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)))
    assert(IcebergWrite.removeOrphanFiles(root) === 0L)
    assert(ids(IcebergRead.read(spark, root)) === Seq(1L))
  }
}
