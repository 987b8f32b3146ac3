package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.MinhashSigs

/** ScalaCheck parity for the native MinhashSigs expression
  * (interpreted eval path; MinhashSigsSpec pins codegen equal to the
  * array_min/transform SQL form on a session): random reduced-hash
  * sets and function counts against an independent plain-Scala
  * min-fold of the same universal-hash family. */
object MinhashSigsProps extends Properties("graft.minhash-sigs") {

  private val genSet: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 2147483646L))

  private val genFuncs: Gen[Int] = Gen.oneOf(1, 8, 64, 128)

  private def reference(hs: List[Long], nFuncs: Int): Seq[Option[Long]] =
    (0 until nFuncs).map { j =>
      if (hs.isEmpty) None
      else Some(hs.map(h => (h * (j + 1) + 37L * j + 101L) % 2147483647L).min)
    }

  property("eval matches the min-fold reference") =
    Prop.forAll(genSet, genFuncs) { (hs, n) =>
      val got = MinhashSigs(
        Literal.create(hs, ArrayType(LongType)), n)
        .eval().asInstanceOf[ArrayData].array.toSeq
        .map(v => Option(v).map(_.asInstanceOf[Long]))
      got == reference(hs, n)
    }

  property("band signatures are a prefix of the longer family") =
    Prop.forAll(genSet) { hs =>
      def sigs(n: Int) = MinhashSigs(
        Literal.create(hs, ArrayType(LongType)), n)
        .eval().asInstanceOf[ArrayData].array.toSeq
      sigs(8) == sigs(128).take(8)
    }
}
