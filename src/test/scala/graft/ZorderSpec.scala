package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Quantifies q_zorder_layout's data-skipping claim: under a range
  * predicate on the SECOND interleaved dimension, a z-ordered file
  * layout prunes files (tight per-file y bounds) while a layout
  * sorted only by the first dimension cannot (every file spans ~the
  * full y range). */
class ZorderSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("z-order bounding boxes prune a y-range predicate better than an x-sort layout") {
    val zIndex = RelationalOps.zorderLayout(spark, sfDir).collect()
    assert(zIndex.nonEmpty)
    val nFiles = zIndex.length

    // same grid, laid out by sorting on x only, binned into the same
    // number of equal-row files
    val o = Tables(spark, sfDir, "orders").select(
      col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
    val bounds = o.agg(
      min("o_custkey").as("cmin"), max("o_custkey").as("cmax"),
      min("day").as("dmin"), max("day").as("dmax"))
    val grid = o.crossJoin(broadcast(bounds)).select(
      expr("(o_custkey - cmin) * 65536 div (cmax - cmin + 1)").as("x"),
      expr("(day - dmin) * 65536 div (dmax - dmin + 1)").as("y"))
    val sortedIndex = grid
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("x"), col("y"))))
      .withColumn("file_id", expr(s"(rn - 1) * $nFiles div ${grid.count()}"))
      .groupBy("file_id")
      .agg(min("y").as("y_min"), max("y").as("y_max"))
      .collect()

    // predicate: middle 1/8th of the y (date) range
    val (lo, hi) = (65536 * 7 / 16, 65536 * 9 / 16)
    def hit(yMin: Long, yMax: Long): Boolean = yMax >= lo && yMin <= hi
    val zHits = zIndex.count(r => hit(r.getLong(4), r.getLong(5)))
    val sHits = sortedIndex.count(r => hit(r.getLong(1), r.getLong(2)))
    assert(zHits < sHits,
      s"z-order should prune better: z hits $zHits/${zIndex.length}, x-sort hits $sHits/${sortedIndex.length}")
    assert(zHits < nFiles, "z-order pruned nothing for a selective y range")
  }
}
