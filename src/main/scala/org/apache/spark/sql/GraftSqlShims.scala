package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a custom
  * LogicalPlan into a DataFrame. Every other integration point
  * (functions, optimizer rules, planner strategies) has a public API
  * via SparkSessionExtensions / experimental methods; plan
  * construction does not — hence this shim in the org.apache.spark.sql
  * package, the standard technique used by open-source Spark
  * extensions.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column <-> Expression bridging (needs no function registry, so
    * kernel-backed Columns work on any session). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
