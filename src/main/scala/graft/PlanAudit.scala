package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print formatted physical plans for selected queries so
  * scale-readiness is auditable (pushdown reaching the scan, broadcast
  * vs shuffle join choice, no nested-loop/cartesian in the pair ops).
  * Usage: runMain graft.PlanAudit [sfDir] [query ...] — no args = a
  * default audit set. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_filter_project", "q_hash_join_inner", "q_join_multiway",
        "q_range_join", "q_minhash_dedup", "q_cosine_topk",
        "q_embedding_neardup", "q_ann_ivf", "q_window_first_meta")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
