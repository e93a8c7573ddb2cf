package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a sparse per-key bucket series
  * and carry values forward across the gaps — the step between "events
  * aggregated by hour" and anything that consumes a REGULAR series
  * (rate comparison, windowed models, charting).
  *
  * Reference scope: the reference aggregates into sparse groups only;
  * this extends the engine's analytics tier. Time buckets are INTEGER
  * epochs (the engine-wide rule: event-time math in the integer
  * domain).
  */
object TimeSeries {

  /** Per key, emit every bucket from that key's min to max (step 1) —
    * missing buckets appear with the last seen value carried forward
    * (`filledCol`) and `is_gap = true`.
    *
    * Scale shape: bounds are one partial-aggregated groupBy; the dense
    * axis is a per-key `sequence` fan-out (rows bounded by range/step,
    * generated distributed — never a driver-side calendar); the fill
    * is ONE per-key window with O(1) running state. A key whose
    * min..max range is pathological (one event in 1970, one today)
    * fans out to range-many rows — bound the input's time domain
    * upstream, or pre-split wide keys.
    */
  def gapFillForward(df: DataFrame, keyCol: String, bucketCol: String,
                     valCol: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val dense = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(df, Seq(keyCol, bucketCol), "left")
      .withColumn("__filled", last(col(valCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valCol).isNull)
      .select(col(keyCol), col(bucketCol),
        col("__filled").as(s"${valCol}_filled"), col("is_gap"))
  }
}
