package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.sources.{DeltaDv, DeltaRead, DeltaWrite, GraftTable, RoaringBitmapArray}
import graft.sources.DeltaDv.DvDescriptor

/** Deletion vectors — the reader-version-3 Delta feature — proven
  * against hand-authored tables and the spec's published byte
  * formats. Three layers:
  *
  *   1. the CODEC: Z85 against the ZeroMQ spec's own test vector, the
  *      RoaringBitmapArray portable serialization against bytes
  *      derived by hand from PROTOCOL.md + RoaringFormatSpec (magic /
  *      cookie / headers / array container), 64-bit and run-container
  *      round-trips, and the DV FILE framing (version byte, big-endian
  *      size words, CRC-32) with every integrity check exercised;
  *   2. the READ: row positions dropped per file across all three
  *      storage flavors (u / i / p), growing vectors under time
  *      travel, partitioned + flat-plan scans, reader-features gating
  *      (unknown features refuse BY NAME; v3 without features refuses
  *      as non-conformant), and the (path, dvId) reconciliation
  *      invariant;
  *   3. the COMPOSITION: syncDelta applies DV-only commits as row
  *      deletes (a path-keyed diff would silently skip them), and the
  *      path-keyed writer/checkpointer refuse DV tables loudly. */
class DeltaDvSpec extends SparkSpec {

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def freshTable(): String =
    Files.createTempDirectory("graft_dv_").toString

  private def dataFile(root: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".stage_${name.hashCode}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    val dest = Paths.get(root, name)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
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

  /** Conformant DV-table protocol: version 3 readers + table features. */
  private def protoLine(features: String*) = {
    val fs = (if (features.isEmpty) Seq("deletionVectors") else features)
      .map(f => s""""$f"""").mkString(",")
    s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      s""""readerFeatures":[$fs],"writerFeatures":[$fs]}}"""
  }

  private def metaLine(schemaJson: String, partCols: Seq[String] = Nil,
                       conf: String = "{}") =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partCols.map(c => s""""$c"""").mkString(",")}],""" +
      s""""configuration":$conf,"createdTime":0}}"""

  private def dvJson(d: DvDescriptor): String =
    s""","deletionVector":{"storageType":"${d.storageType}",""" +
      s""""pathOrInlineDv":"${d.pathOrInlineDv}"""" +
      d.offset.map(o => s""","offset":$o""").getOrElse("") +
      s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""

  private def addLine(path: String, pv: String = "{}",
                      dv: Option[DvDescriptor] = None) =
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":1,""" +
      s""""modificationTime":0,"dataChange":true""" +
      dv.map(dvJson).getOrElse("") + "}}"

  private def removeLine(path: String, dv: Option[DvDescriptor] = None) =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true""" +
      dv.map(dvJson).getOrElse("") + "}}"

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  // ------------------------------------------------------------ codec

  test("Z85: the ZeroMQ spec's test vector, and padded round-trips") {
    // 32/Z85 §Test Case: 86 4F D2 6F B5 59 F7 5B <-> "HelloWorld"
    val vector = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(vector) === "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld", 8).toSeq === vector.toSeq)
    // non-multiple-of-4 input: zero-padded on encode, truncated by the
    // caller-supplied true length on decode (Delta's inline-DV rule)
    for (n <- 1 to 9) {
      val bytes = Array.tabulate(n)(i => (i * 37 + 5).toByte)
      val enc = DeltaDv.z85Encode(bytes)
      assert(enc.length === (n + 3) / 4 * 5)
      assert(DeltaDv.z85Decode(enc, n).toSeq === bytes.toSeq)
    }
    val e = intercept[IllegalArgumentException] {
      DeltaDv.z85Decode("Hello~~~~~", 8) // '~' is not in the alphabet
    }
    assert(e.getMessage.contains("not in the Z85 alphabet"))
  }

  test("RoaringBitmapArray: portable bytes derived by hand from the spec") {
    // {0, 2, 3} in one 32-bit bitmap: magic 1681511377 LE; count=1 LE64;
    // then RoaringFormatSpec portable: SERIAL_COOKIE_NO_RUNCONTAINER
    // (12346) LE32, container count LE32, descriptive header (key=0,
    // cardinality-1=2), offset header (16 = bytes before the container),
    // array container of sorted uint16 values.
    val expect = Array[Int](
      0xd1, 0xd3, 0x39, 0x64, // magic 1681511377 = 0x6439D3D1
      1, 0, 0, 0, 0, 0, 0, 0, // one bitmap
      0x3a, 0x30, 0, 0, // cookie 12346
      1, 0, 0, 0, // 1 container
      0, 0, 2, 0, // key 0, cardinality-1 = 2
      16, 0, 0, 0, // container offset
      0, 0, 2, 0, 3, 0 // values 0, 2, 3
    ).map(_.toByte)
    val got = RoaringBitmapArray(0L, 2L, 3L).serialize()
    assert(got.toSeq === expect.toSeq)
    val back = RoaringBitmapArray.deserialize(got)
    assert(back.toSeq === Seq(0L, 2L, 3L))
    assert(back.cardinality === 3L)
  }

  test("RoaringBitmapArray: 64-bit dense indexing and run containers round-trip") {
    // values straddling three high-32 buckets, including an EMPTY
    // middle bucket the dense array must still serialize
    val hi = 1L << 32
    val vals = Seq(5L, 7L, 2 * hi + 1, 2 * hi + 9)
    val a = RoaringBitmapArray(vals: _*)
    assert(vals.forall(a.contains))
    assert(!a.contains(hi + 5)) // the empty bucket
    assert(!a.contains(6L))
    val back = RoaringBitmapArray.deserialize(a.serialize())
    assert(back.toSeq === vals)

    // a contiguous range run-optimizes into run containers — the
    // reader must consume the RUN cookie path too
    val run = RoaringBitmapArray((0L until 10000L): _*)
    run.runOptimize()
    val ser = run.serialize()
    // SERIAL_COOKIE (12347) in the low 16 bits marks run presence
    val cookie = (ser(12) & 0xff) | ((ser(13) & 0xff) << 8)
    assert(cookie === 12347, "runOptimize did not produce run containers")
    val rback = RoaringBitmapArray.deserialize(ser)
    assert(rback.cardinality === 10000L)
    assert(rback.contains(0L) && rback.contains(9999L) && !rback.contains(10000L))
  }

  test("DV file: write/load round-trip, offsets, and every integrity refusal") {
    val root = freshTable()
    val v1 = RoaringBitmapArray(1L)
    val v2 = RoaringBitmapArray(0L, 4L)
    val Seq(d1, d2) = DeltaDv.writeFile(root, "", Seq(v1, v2))
    assert(d1.storageType === "u" && d1.offset === Some(1L))
    assert(d2.offset.get > d1.offset.get)
    assert(DeltaDv.load(root, d1).toSeq === Seq(1L))
    assert(DeltaDv.load(root, d2).toSeq === Seq(0L, 4L))
    // uniqueIds differ by offset within the same file
    assert(d1.uniqueId !== d2.uniqueId)

    // corrupt one bitmap byte -> CRC refusal
    val p = DeltaDv.dvPath(root, d1)
    val bytes = Files.readAllBytes(p)
    val flip = bytes.clone()
    flip(d1.offset.get.toInt + 4 + 14) = (flip(d1.offset.get.toInt + 4 + 14) ^ 0x01).toByte
    Files.write(p, flip)
    val crcErr = intercept[IllegalArgumentException] { DeltaDv.load(root, d1) }
    assert(crcErr.getMessage.contains("CRC-32"))
    Files.write(p, bytes) // restore

    // descriptor/file size disagreement
    val sizeErr = intercept[IllegalArgumentException] {
      DeltaDv.load(root, d1.copy(sizeInBytes = d1.sizeInBytes + 2))
    }
    assert(sizeErr.getMessage.contains("torn or mis-addressed"))
    // descriptor cardinality disagreement
    val cardErr = intercept[IllegalArgumentException] {
      DeltaDv.load(root, d1.copy(cardinality = 9L))
    }
    assert(cardErr.getMessage.contains("cardinality"))
    // wrong format version byte
    val vflip = bytes.clone(); vflip(0) = 2
    Files.write(p, vflip)
    val verErr = intercept[IllegalArgumentException] { DeltaDv.load(root, d1) }
    assert(verErr.getMessage.contains("format version"))
    Files.write(p, bytes)

    // inline flavor round-trips without touching the filesystem
    val inline = DeltaDv.inlineDescriptor(v2)
    assert(inline.storageType === "i" && inline.offset.isEmpty)
    assert(DeltaDv.load("/nonexistent", inline).toSeq === Seq(0L, 4L))
  }

  // ------------------------------------------------------------- read

  test("read drops DV'd rows; growing vectors time-travel; u/i/p flavors") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val f2 = Seq((4L, "d"), (5L, "e")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    dataFile(root, "f2.parquet", f2)
    writeCommit(root, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f1.parquet"), addLine("f2.parquet")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 2L, 3L, 4L, 5L))

    // v1: delete physical row 1 of f1 (id=2) via a stored vector —
    // remove the DV-less entry, add the DV'd one (same commit)
    val Seq(dv1) = DeltaDv.writeFile(root, "", Seq(RoaringBitmapArray(1L)))
    writeCommit(root, 1, Seq(removeLine("f1.parquet"),
      addLine("f1.parquet", dv = Some(dv1))))
    assert(ids(DeltaRead.read(spark, root)) === Seq(1L, 3L, 4L, 5L))

    // v2: the vector GROWS (rows 0 and 1 deleted) — logical-file key
    // (path, dvId) reconciles the swap
    val Seq(dv2) = DeltaDv.writeFile(root, "ab", Seq(RoaringBitmapArray(0L, 1L)))
    writeCommit(root, 2, Seq(removeLine("f1.parquet", Some(dv1)),
      addLine("f1.parquet", dv = Some(dv2))))
    assert(ids(DeltaRead.read(spark, root)) === Seq(3L, 4L, 5L))

    // v3: f2 gets an INLINE vector deleting its row 0 (id=4)
    val inline = DeltaDv.inlineDescriptor(RoaringBitmapArray(0L))
    writeCommit(root, 3, Seq(removeLine("f2.parquet"),
      addLine("f2.parquet", dv = Some(inline))))
    assert(ids(DeltaRead.read(spark, root)) === Seq(3L, 5L))

    // v4: swap f2's vector to an ABSOLUTE-path one (flavor p)
    val elsewhere = Files.createTempDirectory("graft_dv_ext_").toString
    val Seq(dvU) = DeltaDv.writeFile(elsewhere, "", Seq(RoaringBitmapArray(0L, 1L)))
    val dvP = DvDescriptor("p",
      DeltaDv.dvPath(elsewhere, dvU).toString, dvU.offset,
      dvU.sizeInBytes, dvU.cardinality)
    writeCommit(root, 4, Seq(removeLine("f2.parquet", Some(inline)),
      addLine("f2.parquet", dv = Some(dvP))))
    assert(ids(DeltaRead.read(spark, root)) === Seq(3L))

    // every version still reads exactly as of its commit
    assert(ids(DeltaRead.read(spark, root, 0)) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(DeltaRead.read(spark, root, 1)) === Seq(1L, 3L, 4L, 5L))
    assert(ids(DeltaRead.read(spark, root, 2)) === Seq(3L, 4L, 5L))
    assert(ids(DeltaRead.read(spark, root, 3)) === Seq(3L, 5L))
  }

  test("DVs compose with partition values and with the flat-plan shape") {
    import spark.implicits._
    val root = freshTable()
    // hive layout so the flat shape is provable; partition col p
    val part1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val part2 = Seq((3L, "c"), (4L, "d")).toDF("id", "v")
    dataFile(root, "p=1/f1.parquet", part1)
    dataFile(root, "p=2/f2.parquet", part2)
    val schema = org.apache.spark.sql.types.StructType(
      part1.schema.fields :+
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.IntegerType))
    val Seq(dv) = DeltaDv.writeFile(root, "", Seq(RoaringBitmapArray(0L)))
    writeCommit(root, 0, Seq(protoLine(), metaLine(schema.json, Seq("p")),
      addLine("p=1/f1.parquet", """{"p":"1"}"""),
      addLine("p=2/f2.parquet", """{"p":"2"}""", Some(dv))))

    // union shape (default limit): id=3 (row 0 of the p=2 file) is gone
    val got = DeltaRead.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "v", "p"))
    assert(ids(got) === Seq(1L, 2L, 4L))
    assert(got.where(col("p") === 2).collect().map(_.getLong(0)).toSeq === Seq(4L))

    // flat shape (limit forced under the 2 distinct tuples): same rows
    spark.conf.set("spark.graft.delta.unionPartitionLimit", "1")
    try {
      val flat = DeltaRead.read(spark, root)
      assert(ids(flat) === Seq(1L, 2L, 4L))
    } finally spark.conf.unset("spark.graft.delta.unionPartitionLimit")
  }

  private def col(name: String) = org.apache.spark.sql.functions.col(name)

  test("reader-features gate: unknown features refuse by name; v3 without features refuses") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    writeCommit(root, 0, Seq(protoLine("deletionVectors", "typeWidening"),
      metaLine(f1.schema.json), addLine("f1.parquet")))
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    // ONLY the unknown feature is blamed (the supported one it rode in
    // with is not in the "requires" clause)
    assert(e.getMessage.contains("feature(s) typeWidening this reader"))

    val root2 = freshTable()
    dataFile(root2, "f1.parquet", f1)
    writeCommit(root2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      metaLine(f1.schema.json), addLine("f1.parquet")))
    val e2 = intercept[IllegalArgumentException] { DeltaRead.read(spark, root2) }
    assert(e2.getMessage.contains("no readerFeatures"))

    // a fully-supported feature set at v3 READS
    val root3 = freshTable()
    dataFile(root3, "f1.parquet", f1)
    writeCommit(root3, 0, Seq(
      protoLine("deletionVectors", "timestampNtz", "vacuumProtocolCheck"),
      metaLine(f1.schema.json), addLine("f1.parquet")))
    assert(ids(DeltaRead.read(spark, root3)) === Seq(1L))
  }

  test("reconciliation invariant: a DV re-add without its remove refuses") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    val Seq(dv) = DeltaDv.writeFile(root, "", Seq(RoaringBitmapArray(0L)))
    writeCommit(root, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f1.parquet")))
    // non-conformant: adds (f1, dv) while (f1, no-dv) is still live
    writeCommit(root, 1, Seq(addLine("f1.parquet", dv = Some(dv))))
    val e = intercept[IllegalArgumentException] { DeltaRead.read(spark, root) }
    assert(e.getMessage.contains("multiple live entries"))
  }

  test("timestampNtz feature: TIMESTAMP_NTZ columns read natively") {
    import spark.implicits._
    val root = freshTable()
    val df = Seq((1L, java.time.LocalDateTime.of(2026, 8, 16, 12, 0, 0)),
      (2L, java.time.LocalDateTime.of(2026, 8, 16, 13, 30, 0)))
      .toDF("id", "ts")
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    dataFile(root, "f1.parquet", df)
    writeCommit(root, 0, Seq(protoLine("timestampNtz"),
      metaLine(df.schema.json), addLine("f1.parquet")))
    val got = DeltaRead.read(spark, root)
    assert(got.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(got.orderBy("id").collect().map(_.getAs[java.time.LocalDateTime](1))
      .toSeq === df.orderBy("id").collect()
      .map(_.getAs[java.time.LocalDateTime](1)).toSeq)
  }

  // ------------------------------------------------------ composition

  test("syncDelta applies a DV-only commit as row deletes") {
    import spark.implicits._
    val deltaRoot = freshTable()
    val gt = Files.createTempDirectory("graft_dv_gt_").toString
    val f1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    dataFile(deltaRoot, "f1.parquet", f1)
    writeCommit(deltaRoot, 0, Seq(protoLine(), metaLine(f1.schema.json),
      addLine("f1.parquet")))
    GraftTable.importDelta(spark, deltaRoot, gt, "id", 2)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L, 2L, 3L))

    // v1: DV-only — no path changes; a path diff would see nothing
    val Seq(dv1) = DeltaDv.writeFile(deltaRoot, "", Seq(RoaringBitmapArray(1L)))
    writeCommit(deltaRoot, 1, Seq(removeLine("f1.parquet"),
      addLine("f1.parquet", dv = Some(dv1))))
    val applied = GraftTable.syncDelta(spark, gt)
    assert(applied.map(_._1) === Seq(1L))
    assert(applied.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L, 3L))

    // v2: the vector grows — the incremental diff must emit ONLY the
    // newly-deleted key
    val Seq(dv2) = DeltaDv.writeFile(deltaRoot, "", Seq(RoaringBitmapArray(1L, 2L)))
    writeCommit(deltaRoot, 2, Seq(removeLine("f1.parquet", Some(dv1)),
      addLine("f1.parquet", dv = Some(dv2))))
    val applied2 = GraftTable.syncDelta(spark, gt)
    assert(applied2.map(_._1) === Seq(2L))
    assert(applied2.head._2.rowsDeleted === 1L)
    assert(ids(GraftTable.read(spark, gt)) === Seq(1L))
  }

  test("the writer handles DV tables (r14 write path): append and checkpoint preserve vectors") {
    import spark.implicits._
    val root = freshTable()
    val f1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    dataFile(root, "f1.parquet", f1)
    val Seq(dv) = DeltaDv.writeFile(root, "", Seq(RoaringBitmapArray(0L)))
    // hand-authored LOW protocol with a live vector: the dv-aware
    // writer (DeltaDvWriteSpec has the full surface) must neither
    // refuse nor lose it
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(f1.schema.json), addLine("f1.parquet", dv = Some(dv))))
    assert(ids(DeltaRead.read(spark, root)) === Seq(2L))
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    assert(ids(DeltaRead.read(spark, root)) === Seq(2L, 3L))
    val cpV = DeltaWrite.checkpoint(spark, root)
    (0L to cpV).foreach(v =>
      Files.delete(Paths.get(root, "_delta_log", f"$v%020d.json")))
    assert(ids(DeltaRead.read(spark, root)) === Seq(2L, 3L),
      "the checkpoint must carry the deletion vector")
  }
}
