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

  /** The session's registered catalog instance by name (None when the
    * name is not a catalog) — for [[graft.sources.GraftViewRule]]'s
    * is-this-ours dispatch. */
  def lookupCatalog(spark: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] = {
    val cm = spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager
    try Some(cm.catalog(name))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The session's current catalog name / namespace — captured at
    * CREATE VIEW time so relative names in the view body resolve in
    * the AUTHOR's context. */
  def currentCatalogName(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.currentCatalog.name()

  def currentNamespace(spark: SparkSession): Array[String] =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.currentNamespace

  /** Parse SQL text to an unresolved plan (view-body expansion). */
  def parsePlan(spark: SparkSession, sql: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sql)

  /** Whether `parts` names a (local or global) TEMP view — temp views
    * shadow catalog views in single-part resolution. */
  def isTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalog.isTempView(parts)
}
