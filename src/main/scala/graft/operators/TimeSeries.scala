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

  /** Time-weighted average over IRREGULAR samples: each observation
    * holds its value until the next one, so the mean must weight by
    * holding duration, not by sample count (the spot-price/TWAP
    * contract; a plain avg() over-weights bursts). Integral value
    * column in, exact integers out:
    * `twap = sum(value * dur) DIV sum(dur)` — same unit as the value
    * column (feed cents/ppm fixed-point in for sub-unit resolution) —
    * where `dur = next_ts - ts` (the key's last sample, with no
    * successor, carries no weight). Keys with a single sample emit no
    * row. sum(value x dur) must fit int64: pick value/time units so
    * max|value| x key-span < 2^63 (cents x micros over a year of a
    * hot key is ~1e17 per 1e6-cent value — at that envelope, coarsen
    * dur to millis or widen to decimal(38,0) on both sides).
    *
    * Scale: ONE per-key window (lead) feeding a partial-aggregated
    * groupBy on the same key — Catalyst reuses the single hash
    * Exchange for both. */
  def twap(df: DataFrame, keyCol: String, tsCol: String,
           valCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((tsCol +: tieCols).map(col): _*)
    df.withColumn("__dur", lead(col(tsCol), 1).over(w) - col(tsCol))
      .filter(col("__dur").isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(col(valCol) * col("__dur")).as("__wsum"),
        sum(col("__dur")).as("__dsum"))
      .select(col(keyCol),
        expr("__wsum DIV __dsum").as("twap"),
        col("__dsum").as("span"))
  }
}
