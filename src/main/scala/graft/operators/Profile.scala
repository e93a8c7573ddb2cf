package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling (the ANALYZE/data-quality-monitor shape):
  * per-column null counts, distinct counts, and exact-integer min/max,
  * emitted as one row per profiled column.
  *
  * One aggregation over the table computes every column's stats
  * simultaneously (count/min/max partial-aggregate map-side; the
  * multi-column distinct counts share one expand), then a narrow
  * explode pivots the single stats row into per-column rows. At 100 TB
  * this is exactly one scan of the table.
  */
object Profile {

  /** (name, exact-integer projection) pairs: each column is mapped to a
    * BIGINT domain first (cents / e2 / identity) so min/max are
    * engine-portable. */
  def numeric(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val aggs = cols.flatMap { case (name, c) =>
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_$name"),
        countDistinct(c).as(s"__nd_$name"),
        min(c).as(s"__min_$name"),
        max(c).as(s"__max_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (name, _) =>
      struct(lit(name).as("col_name"),
        col(s"__nulls_$name").as("n_nulls"),
        col(s"__nd_$name").as("n_distinct"),
        col(s"__min_$name").as("min_i"),
        col(s"__max_$name").as("max_i"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
