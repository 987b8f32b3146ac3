package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.DeltaRead

/** Model-based property for [[DeltaRead]]'s state fold: RANDOM Delta
  * logs (adds / removes / re-adds scattered across versions) must
  * reconstruct, at EVERY versionAsOf, exactly the live-file set a
  * trivial in-memory model computes. The fixed DeltaReadSpec fixtures
  * pin the protocol's named behaviors; this pins the fold itself
  * against arbitrary interleavings — re-add after remove, remove of a
  * never-added path, multiple touches of one path in one commit, empty
  * tables. Data files are the model's row payloads (one distinct row
  * per path), so reading the folded table IS reading the model.
  *
  * Native ScalaCheck `Properties` — same offline-framework note as
  * CompatWindowProps. */
object DeltaFoldProps extends Properties("DeltaFold") {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]").appName("DeltaFoldProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate() // shared JVM-wide with the ScalaTest suites

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25) // each case folds a whole table

  private val schemaJson = {
    import spark.implicits._
    Seq((0L, "x")).toDF("id", "v").schema.json
  }

  /** The 8-path data-file pool, written ONCE and referenced by
    * absolute path from every generated log (identical across cases —
    * the property varies the LOG, not the bytes). */
  private lazy val pool: IndexedSeq[String] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_delta_pool_")
    (0 to 7).map { i =>
      val df = Seq((i.toLong, s"p$i")).toDF("id", "v")
      val tmp = dir.resolve(s".s$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dest = dir.resolve(s"f$i.parquet")
      Files.move(part, dest)
      val walk = Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
      dest.toString
    }
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** op = (path index, isAdd). Paths come from a small pool so
    * add/remove/re-add collisions actually happen. */
  private val genCommits: Gen[List[List[(Int, Boolean)]]] =
    Gen.choose(1, 6).flatMap(nCommits =>
      Gen.listOfN(nCommits,
        Gen.choose(1, 5).flatMap(nOps =>
          Gen.listOfN(nOps, Gen.zip(Gen.choose(0, 7), Gen.oneOf(true, false))))))

  private def foldProp(filePool: IndexedSeq[String], protoLine: String,
                       metaLine: String) =
    forAll(genCommits) { commits =>
      val root = Files.createTempDirectory("graft_delta_prop_").toString
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)

      // write the log + fold the model in parallel; data files come
      // from the shared pool by absolute path
      val model = scala.collection.mutable.Set.empty[Int]
      val modelAt = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
      commits.zipWithIndex.foreach { case (ops, v) =>
        val head = if (v == 0) List(protoLine, metaLine) else Nil
        val lines = head ++ ops.map { case (i, isAdd) =>
          if (isAdd) {
            model += i
            s"""{"add":{"path":"${filePool(i)}","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
          } else {
            model -= i
            s"""{"remove":{"path":"${filePool(i)}","deletionTimestamp":0,"dataChange":true}}"""
          }
        }
        Files.write(log.resolve(f"$v%020d.json"),
          lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        modelAt += model.toSet
      }

      modelAt.zipWithIndex.forall { case (want, v) =>
        val got = DeltaRead.read(spark, root, versionAsOf = v)
          .select("id").collect().map(_.getLong(0).toInt).toSet
        val ok = got == want
        if (!ok) println(s"v$v: got=$got want=$want commits=$commits")
        ok
      }
    }

  property("random logs fold to the model's live set at every version") =
    foldProp(pool,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"prop","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":0}}""")

  // ---- column mapping (name mode): same fold, physical-named files ----

  /** Pool twin whose parquet files carry PHYSICAL column names; the
    * mapped schema renames them back to id/v through
    * delta.columnMapping.physicalName metadata. */
  private lazy val mappedPool: IndexedSeq[String] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_delta_mpool_")
    (0 to 7).map { i =>
      val df = Seq((i.toLong, s"p$i")).toDF("col-aaa", "col-bbb")
      val tmp = dir.resolve(s".s$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dest = dir.resolve(s"f$i.parquet")
      Files.move(part, dest)
      val walk = Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
      dest.toString
    }
  }

  private val mappedSchemaJson = {
    import org.apache.spark.sql.types._
    def mf(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    StructType(Seq(mf("id", LongType, "col-aaa", 1),
      mf("v", StringType, "col-bbb", 2))).json
  }

  property("name-mode mapped logs fold and read identically") =
    foldProp(mappedPool,
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"prop-cm","format":{"provider":"parquet","options":{}},"schemaString":${jstr(mappedSchemaJson)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""")

  // ---- deletion vectors: (path, dvId)-keyed fold + row filtering ----

  /** Pool twin with FOUR rows per file (ids i*10 … i*10+3, written in
    * that physical order) so a deletion vector has row positions to
    * bite on. */
  private lazy val dvPool: IndexedSeq[String] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_delta_dvpool_")
    (0 to 7).map { i =>
      val df = (0 to 3).map(r => (i * 10L + r, s"p$i-$r")).toDF("id", "v")
      val tmp = dir.resolve(s".s$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dest = dir.resolve(s"f$i.parquet")
      Files.move(part, dest)
      val walk = Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
      dest.toString
    }
  }

  private sealed trait DvOp
  private case class OpAdd(i: Int) extends DvOp
  private case class OpRm(i: Int) extends DvOp
  private case class OpAddDv(i: Int, mask: Set[Int]) extends DvOp

  private val genDvCommits: Gen[List[List[DvOp]]] = {
    val genOp: Gen[DvOp] = Gen.frequency(
      3 -> Gen.choose(0, 7).map(OpAdd.apply),
      2 -> Gen.choose(0, 7).map(OpRm.apply),
      4 -> Gen.zip(Gen.choose(0, 7),
        Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.toSet))
        .map { case (i, m) => OpAddDv(i, m) })
    Gen.choose(1, 6).flatMap(nCommits =>
      Gen.listOfN(nCommits,
        Gen.choose(1, 5).flatMap(nOps => Gen.listOfN(nOps, genOp))))
  }

  /** Random add / remove / attach-or-swap-inline-DV sequences. The
    * intents are translated STATEFULLY into conformant action lines
    * (swapping a file's vector emits the spec's remove(path, oldDv) +
    * add(path, newDv) pair), and at every version the read must equal
    * the model's surviving rows — pinning the (path, dvId)
    * reconciliation AND the scan-side row filtering at once. */
  property("DV'd logs fold and filter to the model's surviving rows") =
    forAll(genDvCommits) { commits =>
      import graft.sources.{DeltaDv, RoaringBitmapArray}
      val root = Files.createTempDirectory("graft_delta_dvprop_").toString
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)

      def dvJson(d: DeltaDv.DvDescriptor): String =
        s""","deletionVector":{"storageType":"${d.storageType}",""" +
          s""""pathOrInlineDv":"${d.pathOrInlineDv}"""" +
          d.offset.map(o => s""","offset":$o""").getOrElse("") +
          s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
      def addLine(p: String, dv: Option[DeltaDv.DvDescriptor]) =
        s"""{"add":{"path":"$p","partitionValues":{},"size":1,""" +
          s""""modificationTime":0,"dataChange":true""" +
          dv.map(dvJson).getOrElse("") + "}}"
      def rmLine(p: String, dv: Option[DeltaDv.DvDescriptor]) =
        s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":true""" +
          dv.map(dvJson).getOrElse("") + "}}"
      def descr(mask: Set[Int]): DeltaDv.DvDescriptor =
        DeltaDv.inlineDescriptor(RoaringBitmapArray(mask.toSeq.sorted.map(_.toLong): _*))

      // live state: path index -> (descriptor, deleted row positions)
      val live = scala.collection.mutable
        .Map.empty[Int, (Option[DeltaDv.DvDescriptor], Set[Int])]
      val modelAt = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      commits.zipWithIndex.foreach { case (ops, v) =>
        val head =
          if (v > 0) Nil
          else List(
            """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
            s"""{"metaData":{"id":"prop-dv","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":0}}""")
        val lines = head ++ ops.flatMap {
          case OpAdd(i) =>
            val pre = live.get(i).toList.collect {
              case (dv @ Some(_), _) => rmLine(dvPool(i), dv)
            }
            live.update(i, (None, Set.empty))
            pre :+ addLine(dvPool(i), None)
          case OpRm(i) =>
            val cur = live.remove(i)
            List(rmLine(dvPool(i), cur.flatMap(_._1)))
          case OpAddDv(i, mask) =>
            val d = descr(mask)
            val pre = live.get(i).toList.collect {
              case (old, _) if old.map(_.uniqueId) != Some(d.uniqueId) =>
                rmLine(dvPool(i), old)
            }
            live.update(i, (Some(d), mask))
            pre :+ addLine(dvPool(i), Some(d))
        }
        Files.write(log.resolve(f"$v%020d.json"),
          lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        modelAt += live.iterator.flatMap { case (i, (_, deleted)) =>
          (0 to 3).filterNot(deleted).map(r => i * 10L + r)
        }.toSet
      }

      modelAt.zipWithIndex.forall { case (want, v) =>
        val got = DeltaRead.read(spark, root, versionAsOf = v)
          .select("id").collect().map(_.getLong(0)).toSet
        val ok = got == want
        if (!ok) println(s"v$v: got=$got want=$want commits=$commits")
        ok
      }
    }
}
