package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) lookups — "the most recent X at or before T".
  *
  * Two shapes:
  *  - [[priorMarker]]: as-of within ONE ordered stream (e.g. each event
  *    joined to the user's most recent prior signal). A single window
  *    pass: `last(marker, ignoreNulls) OVER (... ROWS UNBOUNDED
  *    PRECEDING TO 1 PRECEDING)` — one shuffle on the entity key, no
  *    join at all. This is the scale-preferred form whenever both sides
  *    can be unioned into one stream.
  *  - [[asofJoin]]: classic two-table as-of join via union+window: tag
  *    left/right rows, union (positional), carry right values forward
  *    with `last(..., ignoreNulls)`, keep left rows. Equivalent to a
  *    backward as-of join with `strict` inequality control; avoids the
  *    range-join blowup of `l.t >= r.t` theta joins.
  */
object AsOf {

  /** Value of `marker` from the most recent STRICTLY PRIOR row in the
    * entity's `orderCol`-ordered stream (null if none).
    *
    * `tieBreakCols` MUST make (keyCol, orderCol, tieBreakCols) unique:
    * the strictly-prior ROWS frame is order-dependent, so equal
    * (key, order) rows without a tiebreak give engine-dependent results.
    */
  def priorMarker(df: DataFrame, keyCol: String, orderCol: String,
                  marker: Column, as: String,
                  tieBreakCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy((orderCol +: tieBreakCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(as, last(marker, ignoreNulls = true).over(w))
  }

  /** Backward as-of join: for each left row, the latest right row with
    * `right.orderCol <= left.orderCol` (ties: right wins — right rows
    * sort before left at equal times). `valueCols` are carried from the
    * right side. Output: left columns + as-of values.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               orderCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.filterNot(c => c == keyCol || c == orderCol).toSeq
    val unioned = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(orderCol), col("__side")) ++
        lCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .union(
        right.withColumn("__side", lit(0))
          .select(Seq(col(keyCol), col(orderCol), col("__side")) ++
            lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            valueCols.map(col): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(orderCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Backward as-of join as a NATIVE operator (custom LogicalPlan +
    * SparkStrategy + SparkPlan, plans.AsofJoinPlan): one streaming
    * merge per partition with O(1) state, after the same
    * exchange+sort Spark would plan for a sort-merge join. Same
    * semantics as [[asofJoin]] (backward, inclusive, right wins ties).
    * `keyCol`/`orderCol` must be LongType on both sides.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
                     orderCol: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(left.schema(keyCol).dataType == LongType &&
      left.schema(orderCol).dataType == LongType &&
      right.schema(keyCol).dataType == LongType &&
      right.schema(orderCol).dataType == LongType,
      "asofJoinNative requires LongType key and order columns")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofStrategy
    }
    // fresh exprIds on the right (Alias allocates new ids): safe when
    // both sides derive from the same source relation (self-as-of)
    val rightPrep = right.select(
      (Seq(col(keyCol).as("__asof_key"), col(orderCol).as("__asof_ord")) ++
        valueCols.map(c => col(c).as(c))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightPrep.queryExecution.analyzed
    val rOut = rPlan.output
    def lAttr(name: String) = lPlan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not in left frame"))
    org.apache.spark.sql.GraftSqlShims.ofRows(spark,
      graft.plans.AsofJoinPlan(lPlan, rPlan,
        lAttr(keyCol), lAttr(orderCol),
        rOut(0), rOut(1), rOut.drop(2)))
  }
}
