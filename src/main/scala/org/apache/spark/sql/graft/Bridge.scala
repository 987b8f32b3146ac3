package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge to Spark's `private[sql]` internals needed to ship a
  * native Catalyst expression from an external library: Column ⇄
  * Expression conversion and imperative function registration. This is
  * the ONLY file in the Spark namespace; everything else lives under
  * `graft`. (The public alternative — SparkSessionExtensions via
  * `spark.sql.extensions` — is also provided in GraftExtensions; the
  * bridge lets query builders self-register into sessions the caller
  * already built, which is what the driver contract hands us.) */
object Bridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** A STREAMING DataFrame over an already-planned batch frame — what
    * a V1 streaming `Source.getBatch` must return (MicroBatchExecution
    * asserts `isStreaming`). The batch plan's physical RDD is wrapped
    * verbatim, so the whole Catalyst plan (scans, anti-joins, CDF
    * derivation) stays distributed — the exact seam production
    * lakehouse streaming sources use. */
  def asStreaming(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
