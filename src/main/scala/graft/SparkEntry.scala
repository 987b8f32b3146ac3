package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a `queries` map (name → plan
  * builder) and an `oracles` map (name → DuckDB SQL); the driver runs
  * both at sf0.01 and hash-compares (Verify.scala → CORRECTNESS_r{N}).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's essence: demux → 1s event-time window → avg
    * (DispatcherFunction.cs:39,:87,:148). */
  def entry(spark: SparkSession): DataFrame =
    EventOps.demuxWindowAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventOps.queries ++ RelationalOps.queries ++ LlmOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ CompatOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    EventOps.oracles ++ RelationalOps.oracles ++ LlmOps.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ CompatOps.oracles
}
