package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Error-bound check for q_approx_distinct (the one query with no SQL
  * oracle by design — HLL results differ across engines). Spark's
  * approx_count_distinct default rsd is 5%; assert every group is
  * within 15% (3 sigma) of the exact distinct count. */
class ApproxDistinctSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 15% of exact per group") {
    val approx = RelationalOps.approxDistinct(spark, sfDir)
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
