package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression converters, which Spark 4 made
  * private[sql] when the Column API moved to ColumnNode. Custom Catalyst
  * expressions (graft.functions) need both directions to be exposed as
  * user-facing Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Dataset.ofRows is private[sql] in Spark 4 — needed to surface a custom
    * LogicalPlan (graft.plans) as a user-facing DataFrame.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
