package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{DeltaRead, DeltaWrite}

/** Model-based property for [[DeltaWrite]]: RANDOM operation sequences
  * (append / overwrite / checkpoint, partitioned and not) executed
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

  /** An op writes a batch of (id, p) rows: Left = append, Right =
    * overwrite; `cp` marks a checkpoint BEFORE the op. Batches draw
    * ids from a small pool so duplicates across versions happen. */
  private case class Op(rows: List[(Long, String)], overwrite: Boolean,
                        cp: Boolean)

  private val genOps: Gen[(Boolean, List[Op])] = for {
    partitioned <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 5)
    ops <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 4)
      rows <- Gen.listOfN(k, Gen.zip(
        Gen.choose(0L, 9L), Gen.oneOf("x", "y", "z")))
      ow <- Gen.oneOf(true, false)
      cp <- Gen.frequency(3 -> false, 1 -> true)
    } yield Op(rows, ow, cp))
  } yield (partitioned, ops)

  property("random write sequences fold to the model at every version") =
    forAll(genOps) { case (partitioned, ops) =>
      import spark.implicits._
      val root = Files.createTempDirectory("graft_deltaw_prop_").toString
      val partBy = if (partitioned) Seq("p") else Nil

      var model = Vector.empty[(Long, String)] // multiset of live rows
      val modelAt = scala.collection.mutable.ArrayBuffer.empty[Vector[(Long, String)]]
      ops.zipWithIndex.foreach { case (op, i) =>
        if (op.cp && i > 0) DeltaWrite.checkpoint(spark, root)
        val df = op.rows.toDF("id", "p")
        if (i == 0) DeltaWrite.create(spark, df, root, partBy)
        else if (op.overwrite) DeltaWrite.overwrite(spark, df, root)
        else DeltaWrite.append(spark, df, root)
        model = if (i > 0 && op.overwrite) op.rows.toVector
                else model ++ op.rows
        modelAt += model
      }

      modelAt.zipWithIndex.forall { case (want, v) =>
        val got = DeltaRead.read(spark, root, v)
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .toVector.sorted
        val ok = got == want.sorted
        if (!ok) println(s"v$v: got=$got want=${want.sorted} ops=$ops " +
          s"partitioned=$partitioned")
        ok
      }
    }
}
