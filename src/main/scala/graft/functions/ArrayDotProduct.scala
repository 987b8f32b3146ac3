package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two float arrays, in double
  * precision — the hot scalar of every similarity/ANN operator
  * (SURVEY §7.3's planned custom-Expression upgrade).
  *
  * Why an Expression and not the `zip_with`+`aggregate` HOF pair:
  * higher-order lambdas evaluate INTERPRETED (one Expression.eval tree
  * walk per element per lambda — benched ~40x slower than generated
  * code on 64-dim vectors), while this expression participates in
  * whole-stage codegen via doGenCode, emitting a tight primitive loop.
  *
  * Semantics match the HOF formulation bit-for-bit: elements are cast
  * float→double, products accumulate left-to-right from 0.0 — the
  * same IEEE sequence DuckDB's `list_reduce` fold performs, so the
  * DuckDB oracles are unchanged. Each side may be array<float> or
  * array<double> (double sides — e.g. inlined hyperplane literals —
  * are used as-is; no precision is invented). Unequal lengths use the
  * shorter prefix; null ELEMENTS are not supported (embeddings are
  * dense — the HOF would return null, this returns the zero-slot
  * product). */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  @transient private lazy val leftIsFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val xv = if (leftIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val yv = if (rightIsFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = $x.numElements() < $y.numElements()
         |    ? $x.numElements() : $y.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xv * $yv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registration surface for graft's native
  * expressions. */
object GraftFunctions {

  /** dot(a, b) in double precision (codegen'd). */
  def array_dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** cosine(a, b) built from the native dot (norms computed per call —
    * operators that can precompute norms should, see LlmOps.withNorm). */
  def array_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    array_dot(a, b) / (sqrt(array_dot(a, a)) * sqrt(array_dot(b, b)))
  }

  /** minhash_sigs(hs, nFuncs) — nFuncs must be a foldable integer
    * literal (it sizes the generated loop at plan time). */
  private[functions] def minhashSigsBuilder(exprs: Seq[Expression]): Expression =
    MinhashSigs(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue)

  /** srp_signatures(embedding, bands, bits) — both geometry args must
    * be foldable integer literals; the hyperplanes derive
    * deterministically from the plane count (VectorOps.srpPlanes), so
    * a SQL caller gets the exact signatures every graft operator and
    * the DuckDB oracles compute. */
  private[functions] def srpSigsBuilder(exprs: Seq[Expression]): Expression = {
    val bands = exprs(1).eval().asInstanceOf[Number].intValue
    val bits = exprs(2).eval().asInstanceOf[Number].intValue
    SrpSignatures(exprs(0), graft.ops.VectorOps.srpPlanes(bands * bits), bits)
  }

  /** Make the library's SQL functions callable in an existing
    * session (the driver contract hands us pre-built sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "portable_hashes",
      PortableHashes.sqlBuilder)
    Bridge.registerFunction(spark, "minhash_sigs", minhashSigsBuilder)
    Bridge.registerFunction(spark, "srp_signatures", srpSigsBuilder)
  }
}

/** SparkSessionExtensions hook: ship the library's SQL functions via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("portable_hashes"),
      new ExpressionInfo(classOf[PortableHashes].getName, "portable_hashes"),
      (exprs: Seq[Expression]) => PortableHashes.sqlBuilder(exprs)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => GraftFunctions.minhashSigsBuilder(exprs)))
    ext.injectFunction((
      FunctionIdentifier("srp_signatures"),
      new ExpressionInfo(classOf[SrpSignatures].getName, "srp_signatures"),
      (exprs: Seq[Expression]) => GraftFunctions.srpSigsBuilder(exprs)))
  }
}
