package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{IcebergRead, IcebergWrite}

/** Model-based property for [[IcebergWrite]]: random create / append /
  * overwrite sequences executed through the writer must reconstruct,
  * at EVERY snapshot id, exactly the multiset a trivial in-memory
  * model computes — [[DeltaWriteProps]]'s twin for the other format.
  * Every read resolves columns by field id through manifests + avro
  * manifest lists the writer emitted, so the property exercises the
  * whole chain (metadata JSON → manifest list → manifest → id-stamped
  * parquet) 25 random tables deep. */
object IcebergWriteProps extends Properties("IcebergWrite") {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]").appName("IcebergWriteProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate() // shared JVM-wide with the ScalaTest suites

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  /** kind 0 = append, 1 = overwrite, 2 = position DELETE of one id
    * (r15) — deletes by this writer's own v2 delete files, applied by
    * this reader's sequence-gated anti-joins. */
  private case class Op(rows: List[(Long, String)], kind: Int, delId: Long)

  private val genOps: Gen[List[Op]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(1, 4)
      rows <- Gen.listOfN(k, Gen.zip(
        Gen.choose(0L, 9L), Gen.oneOf("x", "y", "z")))
      kind <- Gen.frequency(3 -> 0, 2 -> 1, 2 -> 2)
      delId <- Gen.choose(0L, 9L)
    } yield Op(rows, kind, delId)))

  property("random write sequences fold to the model at every snapshot") =
    forAll(genOps) { ops =>
      import spark.implicits._
      val root = Files.createTempDirectory("graft_icew_prop_").toString

      var model = Vector.empty[(Long, String)]
      val modelAt = scala.collection.mutable.ArrayBuffer.empty[(Long, Vector[(Long, String)])]
      ops.zipWithIndex.foreach { case (op, i) =>
        val df = op.rows.toDF("id", "p")
        val snap =
          if (i == 0) IcebergWrite.create(spark, df, root)
          else if (op.kind == 1) IcebergWrite.overwrite(spark, df, root)
          else if (op.kind == 2) IcebergWrite.delete(spark, root,
            org.apache.spark.sql.functions.col("id") === op.delId)
          else IcebergWrite.append(spark, df, root)
        model =
          if (i > 0 && op.kind == 1) op.rows.toVector
          else if (i > 0 && op.kind == 2) model.filterNot(_._1 == op.delId)
          else model ++ op.rows
        modelAt += ((snap, model))
      }

      modelAt.forall { case (snap, want) =>
        val got = IcebergRead.read(spark, root, snap)
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .toVector.sorted
        val ok = got == want.sorted
        if (!ok) println(s"snap$snap: got=$got want=${want.sorted} ops=$ops")
        ok
      }
    }
}
