package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeability of the portable HLL (q_approx_distinct's scale
  * contract): registers built on disjoint partitions of the input and
  * merged by per-bucket max are IDENTICAL to registers built on the
  * whole input — which is why the sketch shuffle moves O(m) state per
  * group and why register tables can be handed across engines or
  * corpus shards and combined. */
class SketchMergeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def h(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")

  private def registers(df: DataFrame): Map[Long, Int] =
    df.select(h(col("l_orderkey")).as("h"))
      .select((col("h") % 512).as("bucket"),
        when(expr("h div 512") === 0, lit(52))
          .otherwise(lit(52) - length(bin(expr("h div 512")))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("per-shard registers merged by max equal whole-input registers") {
    val li = Tables(spark, sfDir, "lineitem")
    val full = registers(li)
    val even = registers(li.where(col("l_orderkey") % 2 === 0))
    val odd = registers(li.where(col("l_orderkey") % 2 === 1))
    val merged = (even.keySet ++ odd.keySet).map { b =>
      b -> math.max(even.getOrElse(b, 0), odd.getOrElse(b, 0))
    }.toMap
    assert(merged == full,
      s"merge-by-max diverged on buckets: ${(merged.toSet diff full.toSet).take(5)}")
    assert(full.nonEmpty && full.values.max >= 1)
  }
}
