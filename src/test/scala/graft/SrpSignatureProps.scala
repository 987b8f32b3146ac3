package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.SrpSignatures

/** ScalaCheck properties for the native SrpSignatures expression
  * (interpreted eval path — SrpSignaturesSpec pins codegen equal to
  * this path on a shared session, so fuzzing one covers both):
  * random vectors, plane geometries, and band widths against an
  * independent plain-Scala fold. No SparkSession needed — the
  * expression evaluates on a Catalyst Literal. */
object SrpSignatureProps extends Properties("graft.srp-signatures") {

  private val genVec: Gen[Array[Float]] = for {
    n <- Gen.chooseNum(1, 80)
    vs <- Gen.listOfN(n, Gen.chooseNum(-5000, 5000).map(_ / 1000.0f))
  } yield vs.toArray

  private val genGeometry: Gen[(Seq[Seq[Double]], Int)] = for {
    bits <- Gen.oneOf(4, 8, 16)
    bands <- Gen.chooseNum(1, 4)
    dim <- Gen.chooseNum(1, 64)
    planes <- Gen.listOfN(bands * bits,
      Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 1000.0)))
  } yield (planes.map(_.toSeq), bits)

  private def reference(v: Array[Float], planes: Seq[Seq[Double]],
                        bits: Int): Seq[Long] = {
    val sigs = new Array[Long](planes.length / bits)
    planes.zipWithIndex.foreach { case (pl, p) =>
      var s = 0.0
      var k = 0
      val n = math.min(pl.length, v.length)
      while (k < n) { s += v(k).toDouble * pl(k); k += 1 }
      if (s > 0) sigs(p / bits) |= 1L << (p % bits)
    }
    sigs.toSeq
  }

  property("eval matches the reference fold on random geometry") =
    Prop.forAll(genVec, genGeometry) { case (v, (planes, bits)) =>
      val expr = SrpSignatures(
        Literal.create(v, ArrayType(FloatType)), planes, bits)
      val got = expr.eval().asInstanceOf[ArrayData].toLongArray().toSeq
      got == reference(v, planes, bits)
    }

  property("every signature fits in its band width") =
    Prop.forAll(genVec, genGeometry) { case (v, (planes, bits)) =>
      val expr = SrpSignatures(
        Literal.create(v, ArrayType(FloatType)), planes, bits)
      val got = expr.eval().asInstanceOf[ArrayData].toLongArray()
      got.forall(sig => sig >= 0L && sig < (1L << bits))
    }
}
