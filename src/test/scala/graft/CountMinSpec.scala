package graft

/** Count-min guarantees on real corpus output: estimates never
  * undercount (one-sided error — the property the sketch trades
  * exactness for), and no estimate exceeds the total token mass. */
class CountMinSpec extends SparkSpec {

  test("estimates are one-sided and mass-bounded") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.TextOps.queries("q_countmin_freq")(spark, dir)
      .collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Long]("overestimate") >= 0L),
      "count-min must never undercount")
    val totalTokens = Tables(spark, dir, "documents")
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(rows.forall(_.getAs[Long]("est_cnt") <= totalTokens))
    // the probe set is the true top-20, so every exact count is >0
    assert(rows.forall(_.getAs[Long]("exact_cnt") > 0L))
  }
}
