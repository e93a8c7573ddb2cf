package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.functions._

/** Distribution statistics over large columns: exact equi-width
  * histograms and mergeable heavy-hitter summaries — the profiling
  * pass a curation pipeline runs before choosing thresholds.
  */
object Stats {

  /** Exact equi-width histogram of an integral column over [lo, hi):
    * `bins` rows (bin, n), empty bins included with n = 0. Bin edges
    * in exact integer arithmetic (`((x - lo) * bins) DIV (hi - lo)`),
    * so the same expression is engine-portable; rows outside [lo, hi)
    * are excluded (count them separately if they matter).
    *
    * Scale: one partial-aggregated groupBy on at most `bins` keys
    * (shuffle O(bins x partitions)), then a broadcast join against the
    * `bins`-row spine. */
  def histogram(df: DataFrame, colName: String, lo: Long, hi: Long,
                bins: Int): DataFrame = {
    require(hi > lo && bins > 0, s"need hi > lo and bins > 0")
    val counts = df
      .filter(col(colName) >= lo && col(colName) < hi)
      .select(expr(
        s"CAST(((($colName) - $lo) * $bins) DIV ${hi - lo} AS INT)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    df.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Misra-Gries heavy-hitter summary of a string column: ONE row,
    * `map<string, bigint>` with at most `k - 1` entries. Guarantees
    * (order-independent, see [[graft.plans.MisraGriesAgg]]): every
    * value with frequency > n/k is a key; counts never overestimate
    * and undershoot by at most n/k. Partial state is k-1 entries per
    * map task — a 100 TB scan returns its heavy hitters through a
    * kilobyte-sized merge. */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    df.agg(GraftSqlShims.column(
      graft.plans.MisraGriesAgg(GraftSqlShims.expression(valueCol), k)
        .toAggregateExpression()).as("mg"))
}
