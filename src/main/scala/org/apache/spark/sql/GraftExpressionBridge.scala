package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between custom Catalyst `Expression`s and the public `Column`
  * API. Spark 4 scopes the Expression⇄Column converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so this one-file
  * shim lives in the `org.apache.spark.sql` package to re-export them for
  * `graft.functions`. `dataFrame` re-exports `Dataset.ofRows` (also
  * `private[sql]`) for PlanSpec's measured-cardinality window audit,
  * which must execute a window's CHILD logical plan to probe its
  * partition-key distinct count. No Spark behavior is modified.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def dataFrame(spark: SparkSession,
                plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
