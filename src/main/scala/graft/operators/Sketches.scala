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
}
