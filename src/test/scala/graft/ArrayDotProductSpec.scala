package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native ArrayDotProduct expression must agree bit-for-bit with
  * the interpreted HOF fold it replaced (both are the left-to-right
  * IEEE sequence the DuckDB oracle's list_reduce performs), in both
  * codegen and interpreted evaluation paths. */
class ArrayDotProductSpec extends SparkSpec {

  private def hofDot = expr(
    """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
      |  cast(0.0 as double), (acc, v) -> acc + v)""".stripMargin)

  test("matches the HOF fold bit-for-bit on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() - 0.5f),
      Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      GraftFunctions.array_dot(col("a"), col("b")).as("native"),
      hofDot.as("hof"))
    assert(got.where(col("native") =!= col("hof")).count() == 0)
    // sanity: a non-trivial value actually computed
    assert(got.agg(sum(abs(col("native")))).head().getDouble(0) > 0.0)
  }

  test("null array input yields null; SQL registration works") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    df.createOrReplaceTempView("adp_t")
    val rows = spark.sql("SELECT array_dot(a, b) AS d FROM adp_t ORDER BY d NULLS LAST")
      .collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("cosine symmetry and range on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = Seq.fill(100)((
      Seq.fill(32)(rnd.nextFloat() - 0.5f),
      Seq.fill(32)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b").select(
      GraftFunctions.array_cosine(col("a"), col("b")).as("ab"),
      GraftFunctions.array_cosine(col("b"), col("a")).as("ba"))
    val collected = df.collect()
    // dot is commutative in IEEE only up to reordering — but both
    // directions multiply pairwise in index order, so they are equal
    assert(collected.forall(r => r.getDouble(0) == r.getDouble(1)))
    assert(collected.forall(r => math.abs(r.getDouble(0)) <= 1.0 + 1e-12))
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq.fill(16)(0.25f))).toDF("v")
    val c = df.select(GraftFunctions.array_cosine(col("v"), col("v")).as("c"))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
