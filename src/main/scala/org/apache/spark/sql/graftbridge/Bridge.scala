package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native Catalyst
  * expressions (graft.functions.VectorExprs). Spark 4 made the classic
  * converters `private[sql]` (the Column API is Connect-agnostic now), so
  * extension libraries host this one-liner inside an
  * `org.apache.spark.sql` subpackage — the same pattern Spark-native
  * connector/extension projects use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame ⇄ LogicalPlan bridge for the engine's custom logical
    * operators (graft.plans): wrap a custom node over an analyzed child
    * plan and hand it back to the session's analyzer/planner.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
