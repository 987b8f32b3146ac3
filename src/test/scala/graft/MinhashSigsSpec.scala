package graft

import org.apache.spark.sql.functions._
import graft.functions.MinhashSigs

/** Codegen-path parity for MinhashSigs on a real session: the native
  * expression must equal the array_min/transform SQL form it
  * replaces, for the band count (8) and the estimator family (128),
  * including empty sets and null elements. */
class MinhashSigsSpec extends SparkSpec {

  private def sqlSigs(n: Int): String =
    s"""transform(sequence(0, ${n - 1}), j -> array_min(transform(hs,
       |  h -> (h * (j + 1) + 37 * j + 101) % 2147483647)))""".stripMargin

  test("native signatures equal the SQL form at 8 and 128 functions") {
    import spark.implicits._
    val df = Seq(
      Seq(5L, 99L, 2147483646L),
      Seq(0L),
      Seq.empty[Long],
      Seq(1234567L, 7654321L, 42L, 42L)
    ).toDF("hs")
    val got = df.select(
      MinhashSigs.sigs(col("hs"), 8).as("native8"),
      expr(sqlSigs(8)).as("sql8"),
      MinhashSigs.sigs(col("hs"), 128).as("native128"),
      expr(sqlSigs(128)).as("sql128"))
    got.collect().foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1), "8-func mismatch")
      assert(r.getSeq[Any](2) == r.getSeq[Any](3), "128-func mismatch")
    }
  }

  test("un-reduced inputs throw instead of silently wrapping") {
    // A raw 60-bit portable hash would overflow h*(j+1) in Java while
    // the DuckDB SQL form errors — the guard turns that silent
    // cross-engine divergence into a loud failure (ADVICE r4).
    import spark.implicits._
    val df = Seq(Seq(1L << 40)).toDF("hs")
    val e = intercept[Exception] {
      df.select(MinhashSigs.sigs(col("hs"), 8)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("outside [0, 2^31-1)")))
  }

  test("null elements are skipped like array_min skips them") {
    val df = spark.sql(
      "SELECT array(CAST(7 AS BIGINT), CAST(NULL AS BIGINT)) AS hs")
    val r = df.select(MinhashSigs.sigs(col("hs"), 2).as("s"))
      .collect().head.getSeq[Long](0)
    assert(r == Seq((7L * 1 + 101L) % 2147483647L,
      (7L * 2 + 37L + 101L) % 2147483647L))
  }
}
