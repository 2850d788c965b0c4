package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters so
  * graft's native Catalyst expressions can be exposed as Columns. Lives in
  * the org.apache.spark.sql namespace purely for access; no Spark code is
  * modified or shadowed. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same access trick for logical plans: build a DataFrame from a custom
  * LogicalPlan node (Dataset.ofRows is private[sql]) and read a frame's
  * analyzed plan. */
object PlanBridge {
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A V1 streaming Source's getBatch contract: the returned frame must
    * carry isStreaming=true. Evaluate the driver-planned batch frame to
    * its InternalRow RDD and rewrap it as a streaming frame — the same
    * internalCreateDataFrame(isStreaming = true) Spark's own V1 sources
    * use. */
  def asStreaming(spark: org.apache.spark.sql.SparkSession,
                  df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = true)
}
