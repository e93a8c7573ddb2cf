package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate, MERGEABLE aggregates — the sketch tier of a 100 TB
  * engine. The scale contract is mergeability: per-partition /
  * per-day sketches are tiny fixed-size states that union without
  * rescanning history, so a year of daily distinct-user sketches rolls
  * up in milliseconds where an exact count would re-shuffle the year.
  *
  * These are deliberately NOT oracle-gated: a cross-engine hash match
  * is impossible by construction (DuckDB's approx_count_distinct and
  * Spark's HLL/KLL use different sketch layouts), so correctness is
  * spec-verified instead — error bounds vs the exact answers (which
  * ARE oracle-gated: q_count_distinct, q_group_quantiles) and
  * merge-consistency properties (SketchesSpec).
  */
object Sketches {

  /** Approximate distinct count per group via HyperLogLog++
    * (partial-aggregable, state = one HLL register array per group). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Apache DataSketches HLL partial: one binary sketch per group —
    * the materialize-then-merge half of the rollup pattern. */
  def hllPartial(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge pre-aggregated sketches down to estimates without touching
    * the base data (the incremental-rollup read path). */
  def hllMerge(partials: DataFrame, groupCols: Seq[String],
               sketchCol: String = "hll"): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("approx_distinct"))

  /** Approximate quantiles via the percentile_approx sketch
    * (GK-style, bounded state `accuracy`, partial-aggregable). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, qs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(qs.map(lit): _*), lit(accuracy)).as("approx_quantiles"))

  // -------------------------------------------------------------------
  // Deterministic mergeable HLL (graft-native, plans.HllDet): unlike
  // the library sketches above — whose estimate depends on HOW the
  // sketch was produced (streamed vs union'd applies HIP vs composite
  // estimators; measured in tools.AbSketch) — these keep only the
  // max-register state, so merge-of-partials == one-shot EXACTLY for
  // any split of the input. That equality is what lets the sketch tier
  // ride the deterministic oracle gate (q_sketch_merge).
  // -------------------------------------------------------------------

  private def aggCol(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    org.apache.spark.sql.GraftSqlShims.column(f.toAggregateExpression())
  private def ex(c: Column) = org.apache.spark.sql.GraftSqlShims.expression(c)
  private def estimateCol(c: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(graft.plans.HllDetEstimate(ex(c)))

  /** One deterministic-HLL register blob (binary) per group. `valueCol`
    * must be bigint — hash other types upstream (e.g. xxhash64). */
  def detPartial(df: DataFrame, groupCols: Seq[String],
                 valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(aggCol(graft.plans.HllDetAgg(ex(col(valueCol)))).as("hll_det"))

  /** Union pre-aggregated deterministic sketches down to estimates —
    * bit-identical to estimating one sketch over the combined input. */
  def detMerge(partials: DataFrame, groupCols: Seq[String],
               sketchCol: String = "hll_det"): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(aggCol(graft.plans.HllDetMergeAgg(ex(col(sketchCol)))).as("__sk"))
      .select(groupCols.map(col) :+
        estimateCol(col("__sk")).as("approx_distinct"): _*)

  /** One-shot deterministic-HLL distinct estimate per group. */
  def detDistinct(df: DataFrame, groupCols: Seq[String],
                  valueCol: String): DataFrame =
    detPartial(df, groupCols, valueCol)
      .select(groupCols.map(col) :+
        estimateCol(col("hll_det")).as("approx_distinct"): _*)
}
