package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Diagnostic: print `Exchange hashpartitioning` counts for named
  * queries (ShuffleBudgetSpec's counting rule) so budget rows can be
  * set from measurement, not guesses.
  * Usage: runMain graft.ExchangeCount [sfDir] q_a q_b ... */
object ExchangeCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
        case p => p.treeString
      }
      val c = "Exchange hashpartitioning".r.findAllIn(plan).length
      val r = "ReusedExchange".r.findAllIn(plan).length
      val s2 = "Scan parquet".r.findAllIn(plan).length
      println(s"EXCHANGES $n $c reused=$r scans=$s2")
    }
    spark.stop()
  }
}
