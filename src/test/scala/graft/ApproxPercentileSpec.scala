package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Error-bound check for q_approx_percentile: the sketch answer must
  * sit within a ±1% rank window of the exact order statistic (the
  * guarantee approx_percentile publishes at any accuracy ≥ 100; at
  * the query's accuracy=1e6 it is in fact exact at this scale, which
  * is what the DuckDB quantile_disc oracle asserts — this spec keeps
  * the weaker published bound so dialing accuracy down for a 100 TB
  * run doesn't break the suite). */
class ApproxPercentileSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx_percentile lands within a 1% rank window of exact") {
    val qs = Seq(0.5, 0.9, 0.99)
    val approx = RelationalOps.approxPercentile(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap

    val exactRows = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    assert(approx.keySet == exactRows.keySet)
    for ((k, sorted) <- exactRows; (q, i) <- qs.zipWithIndex) {
      val got = approx(k)(i)
      // value at the rank 1% below / above the target must bracket it
      val lo = sorted(math.max(0, (sorted.length * (q - 0.01)).toInt))
      val hi = sorted(math.min(sorted.length - 1, (sorted.length * (q + 0.01)).toInt))
      assert(got >= lo && got <= hi,
        s"group $k q=$q: approx=$got outside rank window [$lo, $hi]")
    }
  }
}
