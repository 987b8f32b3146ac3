package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{DeltaRead, DeltaWrite}

/** Model-based property for [[DeltaWrite]]: RANDOM operation sequences
  * (append / overwrite / copy-on-write delete / DELETION-VECTOR
  * delete / purgeVectors / checkpoint, partitioned and not) executed
  * through the WRITER must reconstruct, at EVERY versionAsOf, exactly
  * the multiset a trivial in-memory model computes. DeltaFoldProps
  * pins the reader's fold against hand-written logs; this pins the
  * writer+reader composition against the same model from the other
  * side — for a defect to hide, the writer and reader would have to
  * disagree with each other in exactly cancelling ways AND match the
  * model, on 25 random tables. Checkpoints are interleaved mid-
  * sequence so later reads bootstrap through writer-produced
  * checkpoint parquet, not only JSON. */
object DeltaWriteProps extends Properties("DeltaWrite") {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]").appName("DeltaWriteProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate() // shared JVM-wide with the ScalaTest suites

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  /** An op is an append / overwrite of (id, p) rows or a DELETE of
    * one id; `cp` marks a checkpoint BEFORE the op. Ids draw from a
    * small pool so duplicates across versions (and delete hits /
    * misses) actually happen. Appends may carry a SetTransaction
    * version from a 0..3 pool, so replays (txn version ≤ the folded
    * ledger — which the MODEL tracks too) genuinely occur, including
    * across interleaved checkpoints (the ledger must survive
    * checkpoint bootstrap). */
  private case class Op(rows: List[(Long, String)], kind: Int,
                        delId: Long, cp: Boolean, txnV: Option[Long]) {
    def isAppend: Boolean = kind == 0
    def isOverwrite: Boolean = kind == 1
    def isDelete: Boolean = kind == 2
    def isDvDelete: Boolean = kind == 3 // r14: vectors, protocol upgrade
    def isPurge: Boolean = kind == 4 // r14: dataChange=false rewrite
  }

  private val genOps: Gen[((Boolean, String, Boolean), List[Op])] = for {
    partitioned <- Gen.oneOf(true, false)
    // r15: the same sequences must hold on COLUMN-MAPPED tables —
    // physical staging, physical partitionValues/stats keys, DV adds
    // carrying mapped stats, checkpoints of (3,7) feature protocols
    cmMode <- Gen.frequency(2 -> "none", 1 -> "name", 1 -> "id")
    // r15: half the tables run with the change data feed on — every
    // row-subset delete then carries cdc actions, and the per-version
    // feed must FOLD back to the same model (checked below)
    cdf <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 5)
    ops <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 4)
      rows <- Gen.listOfN(k, Gen.zip(
        Gen.choose(0L, 9L), Gen.oneOf("x", "y", "z")))
      kind <- Gen.frequency(3 -> 0, 2 -> 1, 2 -> 2, 2 -> 3, 1 -> 4)
      delId <- Gen.choose(0L, 9L)
      cp <- Gen.frequency(3 -> false, 1 -> true)
      txnV <- Gen.frequency(2 -> Gen.const(None),
        1 -> Gen.choose(0L, 3L).map(Some(_)))
    } yield Op(rows, kind, delId, cp, txnV))
  } yield ((partitioned, cmMode, cdf), ops)

  property("random write sequences fold to the model at every version") =
    forAll(genOps) { case ((partitioned, cmMode, cdf), ops) =>
      import spark.implicits._
      val root = Files.createTempDirectory("graft_deltaw_prop_").toString
      val partBy = if (partitioned) Seq("p") else Nil
      val conf =
        (if (cmMode == "none") Map.empty[String, String]
         else Map("delta.columnMapping.mode" -> cmMode)) ++
          (if (cdf) Map("delta.enableChangeDataFeed" -> "true")
           else Map.empty[String, String])

      var model = Vector.empty[(Long, String)] // multiset of live rows
      var ledger = -1L // the model's SetTransaction fold for the one appId
      // (delta version, expected rows) — a no-match delete commits NO
      // version (nor does a txn-skipped replay append), so versions are
      // tracked from the writer's returns
      val modelAt = scala.collection.mutable.ArrayBuffer.empty[(Long, Vector[(Long, String)])]
      ops.zipWithIndex.foreach { case (op, i) =>
        if (op.cp && i > 0) DeltaWrite.checkpoint(spark, root)
        val df = op.rows.toDF("id", "p")
        val v =
          if (i == 0) DeltaWrite.create(spark, df, root, partBy, conf)
          else if (op.isDelete)
            DeltaWrite.delete(spark, root, col("id") === op.delId)
          else if (op.isDvDelete)
            DeltaWrite.deleteWithDv(spark, root, col("id") === op.delId)
          else if (op.isPurge) DeltaWrite.purgeVectors(spark, root)
          else if (op.isOverwrite) DeltaWrite.overwrite(spark, df, root)
          else DeltaWrite.append(spark, df, root,
            txn = op.txnV.map(("props-app", _)))
        val txnSkipped = op.isAppend && i > 0 && op.txnV.exists(_ <= ledger)
        model =
          if (i == 0) op.rows.toVector
          else if (op.isDelete || op.isDvDelete)
            model.filterNot(_._1 == op.delId)
          else if (op.isPurge) model // logical content unchanged
          else if (op.isOverwrite) op.rows.toVector
          else if (txnSkipped) model
          else model ++ op.rows
        if (op.isAppend && i > 0 && !txnSkipped)
          op.txnV.foreach(t => ledger = math.max(ledger, t))
        modelAt += ((v, model))
      }

      val snapshotsOk = modelAt
        .groupBy(_._1).map { case (v, states) => (v, states.last._2) }
        .forall { case (v, want) =>
        val got = DeltaRead.read(spark, root, v.toInt)
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .toVector.sorted
        val ok = got == want.sorted
        if (!ok) println(s"v$v: got=$got want=${want.sorted} ops=$ops " +
          s"partitioned=$partitioned cmMode=$cmMode cdf=$cdf")
        ok
      }
      // the CHANGE FEED must fold to the same final multiset: start
      // empty, add each version's inserts, remove its deletes — with
      // CDF on, delete commits take the cdc-authoritative branch, so
      // this pins the WRITTEN change files against the model too
      val last = DeltaRead.latestVersion(root)
      val feed = DeltaRead.readChanges(spark, root, 0L, last)
        .select("id", "p", "_change_type").collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getString(2)))
      val folded = scala.collection.mutable.Map.empty[(Long, String), Int]
        .withDefaultValue(0)
      feed.foreach { case (k, ct) =>
        folded(k) += (if (ct == "insert") 1 else -1)
      }
      val wantBag = model.groupBy(identity).view.mapValues(_.size).toMap
      val gotBag = folded.filter(_._2 != 0).toMap
      val feedOk = gotBag == wantBag && folded.values.forall(_ >= 0)
      if (!feedOk) println(s"feed fold: got=$gotBag want=$wantBag ops=$ops " +
        s"partitioned=$partitioned cmMode=$cmMode cdf=$cdf")
      snapshotsOk && feedOk
    }
}
