package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Error bounds for both approximate-distinct paths: the portable
  * p=9 HLL (q_approx_distinct, cross-engine oracled; sigma =
  * 1.04/sqrt(512) ≈ 4.6%, assert 3-sigma ≈ 14%) and Spark's built-in
  * approx_count_distinct (default rsd 5%, assert 15%). The portable
  * sketch emits exact counts alongside, so its error is checked from
  * the query's own output. */
class ApproxDistinctSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The query emits the raw estimate + empty-register count; the
    * standard consumer-side small-range correction (linear counting
    * when raw <= 2.5m and empties exist — uses ln(), which is why the
    * cross-engine query itself doesn't apply it) is applied here
    * before bounding. */
  private def corrected(raw: Long, empty: Long): Double =
    if (raw <= 2.5 * 512 && empty > 0) 512.0 * math.log(512.0 / empty)
    else raw.toDouble

  test("portable HLL estimate within 14% of the exact count per group") {
    val rows = RelationalOps.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val oEst = corrected(r.getLong(2), r.getLong(3))
      val pEst = corrected(r.getLong(5), r.getLong(6))
      val (oExact, pExact) = (r.getLong(1), r.getLong(4))
      assert(math.abs(oEst - oExact) / oExact < 0.14,
        s"orders for $flag: hll=$oEst exact=$oExact")
      assert(math.abs(pEst - pExact) / pExact < 0.14,
        s"parts for $flag: hll=$pEst exact=$pExact")
    }
  }

  test("native approx_count_distinct within 15% of exact per group") {
    val approx = RelationalOps.approxDistinctNative(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (eo, ep)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.15, s"orders for $k: approx=$ao exact=$eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.15, s"parts for $k: approx=$ap exact=$ep")
    }
  }
}
