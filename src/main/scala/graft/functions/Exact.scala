package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** Exact-arithmetic conventions shared by every gated query and its
  * DuckDB oracle twin. These are load-bearing for the hash gate: any
  * drift between a Spark query and its oracle SQL (which spells the
  * same convention as `CAST(round(x * 100) AS BIGINT)`) breaks the
  * cross-engine compare, so the Spark side has exactly ONE definition.
  */
object Exact {

  /** Money as integer cents: double sums are order-dependent across
    * engines; integer sums are not. */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
