package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** Minimal bridge into Spark's `private[sql]` plan-construction seams.
  *
  * Spark 4 split the public `Column`/`Dataset` API from the Catalyst
  * `Expression`/`LogicalPlan` layer; libraries that contribute a custom
  * logical operator (graft's native as-of join) or a custom scalar
  * `Expression` (graft's vector kernels) still need these three hops:
  *
  *   - Expression -> Column and back ([[column]] / [[expression]])
  *   - LogicalPlan -> DataFrame ([[ofRows]])
  *   - DataFrame -> analyzed LogicalPlan ([[analyzed]])
  *
  * They are `private[sql]`, so this one object lives in a subpackage of
  * `org.apache.spark.sql` — the same approach Delta Lake and other
  * plan-extending libraries use. Everything else in graft stays on the
  * public API.
  */
object bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed

  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[ClassicSparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
