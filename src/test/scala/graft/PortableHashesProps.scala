package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.functions.PortableHashes

/** ScalaCheck parity for the native PortableHashes expression
  * (interpreted eval path; PortableHashesSpec pins codegen equal to
  * the SQL conv/substring/sha2 form on a session): random strings —
  * incl. empty and multi-byte UTF-8 — against an independent
  * hex-string reference that mirrors the SQL
  * `conv(substring(sha2(s, 256), 1, 15), 16, 10)` definition
  * literally: hex render, take 15 chars, parse base 16. */
object PortableHashesProps extends Properties("graft.portable-hashes") {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('a', 'Z', '0', ' ', 'é', '日', '€', '\n'))
      .map(_.mkString))

  private val genArr: Gen[List[String]] = Gen.listOf(genStr)

  private def reference(s: String, mod: Long): Long = {
    val dig = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    val hex = dig.map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (mod > 0) v % mod else v
  }

  private def evalHashes(arr: List[String], mod: Long): Seq[Long] =
    PortableHashes(
      Literal.create(arr, ArrayType(StringType)), mod)
      .eval().asInstanceOf[ArrayData].toLongArray().toSeq

  property("raw hash matches the conv/substring/sha2 definition") =
    Prop.forAll(genArr) { arr =>
      evalHashes(arr, 0L) == arr.map(reference(_, 0L))
    }

  property("modulus folds in exactly") =
    Prop.forAll(genArr, Gen.oneOf(16L, 2147483647L)) { (arr, m) =>
      evalHashes(arr, m) == arr.map(reference(_, m))
    }

  property("values are non-negative 60-bit") =
    Prop.forAll(genArr) { arr =>
      evalHashes(arr, 0L).forall(h => h >= 0L && h < (1L << 60))
    }
}
