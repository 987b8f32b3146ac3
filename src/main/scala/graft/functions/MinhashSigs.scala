package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** The first `nFuncs` MinHash signatures of a hashed shingle set in
  * ONE generated double loop: sig_j = min over h of
  * (h * (j + 1) + 37 * j + 101) % 2147483647 — the same arithmetic
  * universal-hash family the SQL form spells as nFuncs separate
  * `array_min(transform(hset, ...))` columns. Those HOF lambdas run
  * INTERPRETED; at 128 functions × ~100-element sets the folds
  * dominate the whole query (q_minhash_jaccard_est benched 1.76 s vs
  * 0.89 s for the identical band join without them — the simhash
  * lesson again: many-fold per-element math needs codegen, see
  * BASELINE.md). Identical values by construction: inputs are
  * already-reduced 31-bit hashes, h * 129 < 2^39 never overflows,
  * and `%` on non-negative operands agrees across engines.
  *
  * PRECONDITION (enforced at eval time): every element must lie in
  * [0, 2^31-1). A raw 60-bit portable hash fed here un-reduced would
  * silently wrap in Java's long multiply while the equivalent DuckDB
  * SQL raises an overflow error — a cross-engine divergence. Reduce
  * with `pmod(h, 2147483647)` first (what all callers do); violations
  * throw instead of diverging.
  *
  * Null elements are skipped exactly as `array_min` skips them; a
  * set with no non-null elements yields null signatures (matching
  * `array_min(empty) = null`). */
case class MinhashSigs(child: Expression, nFuncs: Int)
    extends UnaryExpression {

  require(nFuncs > 0, s"nFuncs must be positive, got $nFuncs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](nFuncs)
    var j = 0
    while (j < nFuncs) {
      var best = Long.MaxValue
      var any = false
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          if (h < 0L || h >= 2147483647L)
            throw new IllegalArgumentException(
              s"minhash_sigs input $h outside [0, 2^31-1); reduce with pmod first")
          val v = (h * (j + 1) + 37L * j + 101L) % 2147483647L
          if (v < best) best = v
          any = true
        }
        i += 1
      }
      out(j) = if (any) java.lang.Long.valueOf(best) else null
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val any = ctx.freshName("any")
      val hv = ctx.freshName("hv")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |Object[] $out = new Object[$nFuncs];
         |for (int $j = 0; $j < $nFuncs; $j++) {
         |  long $best = Long.MAX_VALUE;
         |  boolean $any = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      long $hv = $v.getLong($i);
         |      if ($hv < 0L || $hv >= 2147483647L)
         |        throw new IllegalArgumentException(
         |          "minhash_sigs input " + $hv +
         |          " outside [0, 2^31-1); reduce with pmod first");
         |      $hv = ($hv * ($j + 1) + 37L * $j + 101L) % 2147483647L;
         |      if ($hv < $best) $best = $hv;
         |      $any = true;
         |    }
         |  }
         |  $out[$j] = $any ? (Object) java.lang.Long.valueOf($best) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {
  /** Column API: first-nFuncs MinHash signatures of an array<bigint>
    * of reduced (mod 2^31-1) portable hashes. */
  def sigs(hset: Column, nFuncs: Int): Column =
    Bridge.column(MinhashSigs(Bridge.expression(hset), nFuncs))
}
