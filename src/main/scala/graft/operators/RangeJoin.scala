package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins without the theta-join blowup.
  *
  * A naive `p BETWEEN lo AND hi` join has no equi-key, so Spark plans
  * BroadcastNestedLoopJoin (O(n*m) comparisons) or, worse, a cartesian
  * shuffle. Bucketing restores an equi-key: quantize the domain into
  * `bucketWidth`-sized cells, replicate each interval into every cell
  * it overlaps (fanout = interval length / width + 1, small when the
  * width is chosen near the typical interval length), and equi-join
  * points to cells. Each qualifying (point, interval) pair meets in
  * EXACTLY one cell — the point's — so no post-join dedup is needed.
  *
  * At scale this is the standard shape: shuffle is hash-partitioned on
  * the cell key, both sides prune by cell, and the residual BETWEEN
  * filter runs inside the codegen'd join. Skewed cells (a hot time
  * range) can be salted like any other equi-join key (ScaleOps).
  */
object RangeJoin {

  /** Floor-division of a long column expression by a positive literal
    * width, in EXACT long arithmetic: `(x - pmod(x, w)) DIV w`. The
    * numerator is an exact multiple of `w`, so integral DIV equals
    * floor over the entire signed-long domain — unlike
    * `floor(x / w)`, which routes through double division and loses
    * exactness for |x| > 2^53. `colSql` is a SQL expression string
    * (column name or composite like `greatest(a, b)`). */
  private def floorDivCell(colSql: String, width: Long) =
    expr(s"($colSql - pmod($colSql, ${width}L)) DIV ${width}L")

  /** Inner-join `points` (with long column `pointCol`) to `intervals`
    * (with long columns `loCol`, `hiCol`, inclusive bounds), keeping
    * pairs where `lo <= p <= hi`. Column names must not collide across
    * the two frames (rename beforehand — same contract as any join).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__cell",
      floorDivCell(pointCol, bucketWidth))
    val iv = intervals.withColumn("__cell",
      explode(sequence(
        floorDivCell(loCol, bucketWidth),
        floorDivCell(hiCol, bucketWidth))))
    p.join(iv, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Interval × interval overlap join: keep pairs where
    * `[loL,hiL]` and `[loR,hiR]` (inclusive long bounds) intersect,
    * optionally under additional equi-keys (`extraKeys`, same-named on
    * both sides). Both sides replicate into every `bucketWidth` cell
    * they touch; a qualifying pair shares every cell covering the
    * intersection, so ownership is assigned to EXACTLY ONE of them —
    * the cell containing the overlap start `max(loL, loR)` (which lies
    * in both intervals whenever they overlap). No post-join dedup, no
    * double counting, and the join stays a hash/SMJ equi-join on
    * (cell, extraKeys) — never a nested loop.
    *
    * Scale: fanout per row = interval length / width + 1; pick the
    * width near the typical interval length. A hot cell (a time range
    * everyone overlaps) is an ordinary skewed equi-key — salt it or
    * let AQE split it. Column names must not collide across sides
    * except for `extraKeys`.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loL: String, hiL: String, loR: String, hiR: String,
                      bucketWidth: Long,
                      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def cells(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__cell", explode(sequence(
        floorDivCell(lo, bucketWidth),
        floorDivCell(hi, bucketWidth))))
    cells(left, loL, hiL)
      .join(cells(right, loR, hiR), "__cell" +: extraKeys)
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__cell") ===
          floorDivCell(s"greatest($loL, $loR)", bucketWidth))
      .drop("__cell")
  }
}
