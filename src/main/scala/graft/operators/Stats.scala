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

  /** Robust per-group outlier ranking by median/MAD z-score: for each
    * group, the `topK` rows with the largest |x - median| / MAD, with
    * the exact integer score `rz_e6 = 1e6 * |x - med| / MAD` (floored).
    *
    * Median and MAD are interpolated medians over an INTEGRAL column:
    * midpoints are either .0 or .5, so `2 x median` is an exact
    * integer in every IEEE engine and the whole score pipeline stays
    * in exact integer arithmetic — `dev2 = |2x - med2|`,
    * `mad4 = median of dev2 doubled`, `rz_e6 = 2e6 * dev2 DIV mad4`
    * (2x because dev2/mad4 carry one doubling each). Engine-portable
    * and hash-gateable; no doubles survive into the output.
    *
    * Shape: both medians and the final rank partition on `groupCol` —
    * Catalyst plans ONE Exchange reused by all three window passes.
    * At 100 TB exact per-group medians require a per-group sort, which
    * is what the single hash partition + in-partition sort pays for;
    * for a first pass at scale, substitute the GK sketch
    * ([[Sketches.approxQuantiles]]) and keep the same score shape.
    * Groups must individually fit a partition (same contract as every
    * exact per-group quantile, [[Quantiles.perGroup]]); MAD = 0 groups
    * (over half the values at the median) emit rz_e6 = -1 sentinel
    * rows rather than dividing by zero. */
  def outliersMad(df: DataFrame, groupCol: String, valCol: String,
                  tieCols: Seq[String], topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val med2 = (expr(s"percentile($valCol, 0.5)").over(byGroup) * 2)
      .cast("long")
    val scored = df
      .withColumn("dev2", abs(col(valCol) * 2 - med2))
      .withColumn("mad4",
        (expr("percentile(dev2, 0.5)").over(byGroup) * 2).cast("long"))
      .withColumn("rz_e6",
        when(col("mad4") === 0, lit(-1L))
          .otherwise(expr("(dev2 * 2000000) DIV mad4")))
    val rankW = Window.partitionBy(col(groupCol))
      .orderBy(col("rz_e6").desc +: tieCols.map(col): _*)
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= topK)
      .select(col(groupCol) +: tieCols.map(col) :+ col(valCol) :+
        col("rz_e6") :+ col("rank"): _*)
  }

  /** Most frequent value per group (grouped mode) with a total
    * tiebreak (highest count, then smallest value — deterministic in
    * every engine). Shape: partial-aggregated groupBy(group, value)
    * first — the heavy input collapses to distinct pairs BEFORE the
    * per-group rank window, so the window sorts counts, not rows. */
  def modePerGroup(df: DataFrame, groupCol: String,
                   valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(valCol).asc)
    df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valCol).as("mode_value"), col("cnt"))
  }

  /** Equi-depth discretization: per group, split rows into `k`
    * near-equal-count bins by value order (ntile) and emit per-bin
    * count + [min, max] value bounds — the feature-bucketing /
    * histogram-equalization pass. `tieCols` must make the ordering
    * total: ntile is POSITIONAL, so tied values are deterministic only
    * under a total order (same rule as every ranking op here).
    * ONE exchange on the group key shared by the window and the
    * following (group, bin) aggregate. */
  def equiDepthBins(df: DataFrame, groupCol: String, valCol: String,
                    tieCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy((valCol +: tieCols).map(col): _*)
    df.withColumn("bin", ntile(k).over(w))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }

  /** Exact inner-equi-join output cardinality WITHOUT running the
    * join: |A ⋈ B| = Σ_k cntA(k)·cntB(k). Both sides collapse to
    * per-key counts first (partial-agg, shuffle O(distinct keys)),
    * so the estimate costs two count-aggregates and a count-table
    * join — not the data-sized shuffle the real join pays. The
    * planner-advisor companion to [[keySkew]]: run both, then decide
    * broadcast / salt / proceed. One row: (join_rows, matched_keys).
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
                       keyCol: String): DataFrame = {
    val a = left.groupBy(col(keyCol)).agg(count(lit(1)).as("__ca"))
    val b = right.groupBy(col(keyCol)).agg(count(lit(1)).as("__cb"))
    a.join(b, Seq(keyCol))
      .agg(sum(col("__ca") * col("__cb")).as("join_rows"),
        count(lit(1)).as("matched_keys"))
  }

  /** Key-skew profile: ONE summary row describing how unevenly rows
    * distribute over a key — the diagnostic you run BEFORE picking a
    * join/aggregation strategy at scale (salt? AQE skew split?
    * broadcast?). Emits exact integers only:
    * n_keys, total_rows, max_cnt, min_cnt,
    * avg_x1000 = total*1000 DIV n_keys, and
    * top_share_ppm = max*1e6 DIV total (the hottest key's row share —
    * the number that predicts a straggler task).
    *
    * Shape: partial-aggregated groupBy on the key (the same shuffle
    * the real query would pay) followed by a single scalar aggregate —
    * shuffle O(distinct keys x partitions), driver receives one row.
    */
  def keySkew(df: DataFrame, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("k")).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"),
        max(col("cnt")).as("max_cnt"),
        min(col("cnt")).as("min_cnt"))
      .withColumn("avg_x1000", expr("total_rows * 1000 DIV n_keys"))
      .withColumn("top_share_ppm", expr("max_cnt * 1000000 DIV total_rows"))
}
