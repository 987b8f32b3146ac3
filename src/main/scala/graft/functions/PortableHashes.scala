package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash (LlmOps.portableHash — first 15 hex chars
  * of sha256, ≡ DuckDB `CAST('0x' || substring(sha256(s), 1, 15) AS
  * BIGINT)`) over every element of an array<string>, as ONE native
  * expression with an optional modulus folded in.
  *
  * Why: the shingle pipelines (MinHash bands, Jaccard/containment
  * verify, fingerprints, dedup clustering) hash each shingle inside a
  * `transform` lambda — and HOF lambda bodies always run INTERPRETED.
  * Interpreted `Sha2` re-resolves the MessageDigest provider and
  * round-trips through hex + `Conv` per element; this expression runs
  * inside whole-stage codegen, reuses one MessageDigest per generated
  * class, digests the raw UTF-8 bytes, and takes the top 60 bits
  * arithmetically (first 8 big-endian bytes >>> 4 — exactly the value
  * of the first 15 hex digits). Same values, so every downstream
  * DuckDB oracle is untouched.
  *
  * `mod > 0` applies `% mod` per element (the universal-hash family
  * prep in the LSH ops); elements are non-negative, so `%` and
  * `pmod` agree. Null elements map to null, mirroring `transform`.
  *
  * Measured honestly: at gate SF the LSH-family queries are at parity
  * to ~20% faster (one sha per element never dominated them — unlike
  * simhash's 32 folds, which already got the explode+agg rewrite).
  * The expression's value is keeping the per-byte hash cost inside
  * codegen where it scales with corpus bytes, and giving the repo ONE
  * fuzz-tested primitive for the portable hash instead of an SQL
  * string pasted into every transform. */
case class PortableHashes(child: Expression, mod: Long)
    extends UnaryExpression {

  require(mod >= 0, s"mod must be non-negative, got $mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_hashes requires array<string>, got ${t.simpleString}")
  }

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)

  override def prettyName: String = "portable_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("SHA-256")
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = java.lang.Long.valueOf(
          PortableHashes.hash60(md, arr.getUTF8String(i), mod))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftSha",
      v => s"""try { $v = java.security.MessageDigest.getInstance("SHA-256"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e); }""".stripMargin)
    val modExpr = if (mod > 0) s" % ${mod}L" else ""
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dig = ctx.freshName("dig")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    byte[] $dig = $md.digest($v.getUTF8String($i).getBytes());
         |    long $h = 0L;
         |    for (int $b = 0; $b < 8; $b++) {
         |      $h = ($h << 8) | ((long) $dig[$b] & 0xffL);
         |    }
         |    $out[$i] = java.lang.Long.valueOf(($h >>> 4)$modExpr);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHashes {
  /** Shared scalar core: top 60 bits of sha256, optional modulus. */
  private[functions] def hash60(md: MessageDigest, s: UTF8String,
                                mod: Long): Long = {
    val dig = md.digest(s.getBytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
    val v = h >>> 4
    if (mod > 0) v % mod else v
  }

  /** Column API: portable 60-bit hashes of an array<string>, with an
    * optional per-element modulus (0 = raw hash). */
  def hashes(arr: Column, mod: Long = 0L): Column =
    Bridge.column(PortableHashes(Bridge.expression(arr), mod))

  /** SQL builder: `portable_hashes(arr)` or
    * `portable_hashes(arr, mod)` with an integer-literal modulus
    * (a non-literal modulus would defeat per-class codegen of the
    * folded `% mod`). Shared by GraftFunctions.register and the
    * GraftExtensions `spark.sql.extensions` hook. */
  private[functions] def sqlBuilder(
      exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val mod = exprs match {
      case Seq(_) => 0L
      case Seq(_, Literal(v: Long, LongType)) => v
      case Seq(_, Literal(v: Int, IntegerType)) => v.toLong
      case _ => throw new IllegalArgumentException(
        "portable_hashes(arr[, mod]): mod must be an integer literal")
    }
    PortableHashes(exprs.head, mod)
  }
}
