package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** At-rest layout writers — the storage half of the 100 TB design.
  *
  * The reference has no at-rest story (events come from a hub, results
  * go to a socket); an analytics engine over the same data needs one,
  * and the layout decides which queries ever touch which bytes:
  *
  *   - HIVE-PARTITIONED parquet (`partitionBy`): the partition column
  *     becomes a directory key, so a filter on it prunes entire
  *     directories at PLANNING time — the scan never opens them. Use
  *     for low-cardinality, always-filtered keys (date, lang, source).
  *     Never for high-cardinality keys (one dir per value = small-file
  *     death).
  *   - BUCKETED tables (`bucketBy` + `saveAsTable`): rows are
  *     pre-shuffled into a fixed number of hash buckets on the join/agg
  *     key AT WRITE TIME. Two tables bucketed the same way join with
  *     ZERO exchange — the single biggest shuffle eliminator for a
  *     fact-to-fact join repeated across a pipeline (pay the shuffle
  *     once at ingest, never again).
  *   - `sortWithinPartitions` before write: clusters values so parquet
  *     row-group min/max stats become selective — predicate pushdown
  *     skips row groups, not just columns.
  */
object ParquetLayout {

  /** Write `df` hive-partitioned by `partCols`, each output partition
    * sorted by `sortCols` for row-group stat selectivity. */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String], sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Register `df` as a bucketed+sorted parquet table in the session
    * catalog. Joins/aggs on `bucketCol` between tables sharing
    * `nBuckets` run shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read back a partitioned dataset (partition columns are recovered
    * from the directory structure). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Streaming → at-rest bridge: attach a foreachBatch sink that lands
    * each micro-batch of `stream` as hive-partitioned parquet under
    * `path`. Append mode per micro-batch (watermarked aggregations
    * emit each window exactly once, so appends never rewrite a
    * window); partition columns give downstream batch queries
    * planning-time pruning over the landed history. This is the
    * ingest topology: stream job lands partitioned files, the batch
    * engine (everything in graft.ops) reads them. */
  def streamToPartitioned(stream: DataFrame, path: String,
                          partCols: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(SaveMode.Append)
          .partitionBy(partCols: _*)
          .parquet(path)
      }
}
