package graft

import org.apache.spark.sql.functions._
import graft.functions.SrpSignatures

/** The native SrpSignatures expression against a plain-Scala reference
  * of the same fold (left-to-right x*w from 0.0), on both execution
  * paths — whole-stage codegen (default) and forced-interpreted — so
  * doGenCode and nullSafeEval can't drift apart. */
class SrpSignaturesSpec extends SparkSpec {

  private val planes: Seq[Seq[Double]] =
    Seq(Seq(1.0, -1.0, 0.5), Seq(-0.25, 0.75, -0.5),
      Seq(0.1, 0.2, 0.3), Seq(-1.0, -1.0, 3.0))

  private def reference(v: Seq[Float], bits: Int): Seq[Long] = {
    val sigs = new Array[Long](planes.length / bits)
    planes.zipWithIndex.foreach { case (pl, p) =>
      var s = 0.0
      v.indices.take(pl.length).foreach(k => s += v(k).toDouble * pl(k))
      if (s > 0) sigs(p / bits) |= 1L << (p % bits)
    }
    sigs.toSeq
  }

  private val vectors = Seq(
    Seq(1.0f, 0.0f, 0.0f),   // plane sign pattern 1,0,1,0 at bits=2
    Seq(0.0f, 1.0f, 0.0f),
    Seq(-0.5f, -0.5f, 2.0f),
    Seq(0.0f, 0.0f, 0.0f))   // all dots 0 → strict > keeps bits clear

  private def run(): Map[Int, Seq[Long]] = {
    import spark.implicits._
    vectors.zipWithIndex.toDF("embedding", "i")
      .select(col("i"),
        SrpSignatures.signatures(col("embedding"), planes, bits = 2).as("sigs"))
      .as[(Int, Seq[Long])].collect().toMap
  }

  test("matches the reference fold under whole-stage codegen") {
    val got = run()
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == reference(v, 2), s"vector $i")
    }
    // sanity on the hand-checkable case: dots of e_x are the planes'
    // first weights (+,-,+,-) → band0 bit0, band1 bit0
    assert(got(0) == Seq(1L, 1L))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = run()
      vectors.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == reference(v, 2), s"vector $i (interpreted)")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
