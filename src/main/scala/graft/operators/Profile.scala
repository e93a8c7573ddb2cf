package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling (the ANALYZE/data-quality-monitor shape):
  * per-column null counts, distinct counts, and exact-integer min/max,
  * emitted as one row per profiled column.
  *
  * Shape: ONE scan explodes each row into (col_name, value) pairs; a
  * partial-aggregated groupBy on (col_name, value) dedups before the
  * exchange (shuffle = distinct values per column per partition); a
  * second tiny aggregate on col_name folds counts, nulls, and min/max.
  * This deliberately avoids Spark's multi-column DISTINCT rewrite — an
  * Expand to N+1 row copies partially aggregated on an N+2-column key —
  * which at the same one-scan cost hashed 2.5x the rows on 5-field
  * keys (measured 2.4 s -> 1.4 s at sf0.1 for a 4-column lineitem
  * profile). At 100 TB both are one scan; this one shuffles less.
  */
object Profile {

  /** (name, exact-integer projection) pairs: each column is mapped to a
    * BIGINT domain first (cents / e2 / identity) so min/max are
    * engine-portable. */
  def numeric(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val kv = df.select(explode(array(cols.map { case (name, c) =>
        struct(lit(name).as("k"), c.cast("long").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.k").as("k"), col("kv.v").as("v"))
    val stats = kv.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(
        coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_i"),
        max(col("v")).as("max_i"))
    // column spine: a profile reports one row per PROFILED COLUMN even
    // over an empty table (zero counts, null min/max) — the ANALYZE
    // contract, and what a per-column aggregate oracle returns
    import df.sparkSession.implicits._
    cols.map(_._1).toDF("col_name")
      .join(stats, col("col_name") === col("k"), "left")
      .select(col("col_name"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_i"), col("max_i"))
  }
}
