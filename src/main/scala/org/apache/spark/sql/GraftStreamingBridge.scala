package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Minimal bridge into the one `private[sql]` constructor a V1
  * streaming source needs: `internalCreateDataFrame(..., isStreaming
  * = true)` — the same seam Spark's own FileStreamSource (and Delta's
  * streaming source) use to hand a batch DataFrame back to the
  * micro-batch engine. Nothing else crosses this package boundary. */
object GraftStreamingBridge {
  def streamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The sink-side twin: re-anchor a micro-batch's rows as a PLAIN
    * batch DataFrame (the V1 `Sink.addBatch` frame is tied to the
    * incremental execution and must not be re-planned — Delta's
    * DeltaSink does exactly this repackaging). */
  def batchFrame(spark: SparkSession, rdd: RDD[InternalRow],
                 schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
