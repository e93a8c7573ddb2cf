package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String-packed-list flattening (reference: mergeAndTransformProductData,
  * ApplaudoETL.scala:156-168 — `order_detail` is a `~`-separated list of
  * `product|aisle|qty` triples, exploded to one row per item).
  *
  * Spark-first shape: `split` -> `explode` (Catalyst Generate) -> per-field
  * `getItem` projections, all narrow (no shuffle), all inside whole-stage
  * codegen. At 100 TB this is a pure map stage: scales linearly with input
  * splits, no exchange.
  */
object Flatten {

  /** One row per element of `split(col, itemSep)`; other columns carried. */
  def explodeDelimited(df: DataFrame, column: String, itemSep: String,
                       as: String): DataFrame =
    df.withColumn(as, explode(split(col(column), itemSep)))

  /** Explode a packed list column and project its `fieldSep`-separated
    * fields into named columns, dropping the intermediates.
    *
    * `fields` maps output column name -> (field index, cast target or null).
    */
  def explodeRecords(df: DataFrame, column: String, itemSep: String,
                     fieldSep: String,
                     fields: Seq[(String, Int, Option[String])]): DataFrame = {
    val exploded = df.withColumn("__rec", explode(split(col(column), itemSep)))
    val parts = split(col("__rec"), fieldSep)
    val withFields = fields.foldLeft(exploded) { case (d, (name, idx, cast)) =>
      val c = parts.getItem(idx)
      d.withColumn(name, cast.fold(c)(t => c.cast(t)))
    }
    withFields.drop(column, "__rec")
  }

  /** Token list of a whitespace-separated text column (no explode). */
  def tokens(c: Column): Column = split(c, " ")
}
