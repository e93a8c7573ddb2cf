package graft.etl

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{Classify, Flatten, Quantiles, Validate}

/** Order row as ingested (reference Product, ApplaudoETL.scala:17-18). */
case class Product(order_id: Long, user_id: Long, order_number: Int,
                   order_dow: Int, order_hour_of_day: Int,
                   days_since_prior_order: Float, order_detail: String)

/** Dimension row (reference ProductDetail, ApplaudoETL.scala:15). */
case class ProductDetail(product_name: String, aisle: String,
                         department: String)

/** The reference pipeline (carlossegovia/scala-etl-test), re-expressed
  * Spark-first. Each stage is a pure DataFrame -> DataFrame function —
  * independently callable like the reference's public methods — built
  * from the generic operators in graft.operators.
  *
  * Deliberate differences at identical semantics (SURVEY.md §4):
  *  - both classification UDFs (ApplaudoETL.scala:200-211, 234-245) are
  *    native `when` chains -> whole pipeline is codegen-able;
  *  - all 21 quantile thresholds come from ONE job, not 7 serial
  *    driver actions (ApplaudoETL.scala:250-257);
  *  - the validated frame is cached before fan-out (the reference
  *    recomputes it >= 9 times, SURVEY.md §3.3);
  *  - chained withColumn stages collapse into single selects.
  */
object ReferenceEtl {

  val ProductSchema: StructType = Encoders.product[Product].schema

  /** Department sets (reference ApplaudoETL.scala:196-198). */
  val MomDepartments: Seq[String] =
    Seq("dairy eggs", "bakery", "household", "babies")
  val SingleDepartments: Seq[String] =
    Seq("canned goods", "meat seafood", "alcohol", "snacks", "beverages")
  val PetFriendlyDepartments: Seq[String] =
    Seq("canned goods", "pets", "frozen")

  /** P1-P8 (reference mergeAndTransformProductData,
    * ApplaudoETL.scala:156-168): positional union of the two order
    * sources, explode the `~`-packed `product|aisle|qty` triples,
    * project + repair. All narrow — a pure map stage at any scale. */
  def mergeAndTransform(blobOrders: DataFrame, dbOrders: DataFrame): DataFrame = {
    val unioned = blobOrders.union(dbOrders) // positional, like the reference
    Flatten.explodeRecords(unioned, "order_detail", "~", "\\|",
        Seq(("product", 0, None), ("aisles", 1, None),
          ("number_of_products", 2, Some("int"))))
      .withColumn("product",
        regexp_replace(col("product"), "[^\\x00-\\x7F]", ""))
      .withColumn("days_since_prior_order",
        col("days_since_prior_order").cast("int"))
      .withColumn("order_hour_of_day",
        when(col("order_hour_of_day") === 24, 0)
          .otherwise(col("order_hour_of_day")))
  }

  /** J1 (ApplaudoETL.scala:39-44): broadcast LEFT join against the
    * product dimension; dim columns disambiguated then dropped. */
  def joinProductDetails(products: DataFrame, dim: DataFrame): DataFrame =
    products.join(
        broadcast(dim.withColumnRenamed("aisle", "aisle_pd")),
        products("product") === dim("product_name"), "left")
      .drop("aisle_pd", "product_name")

  /** P10-P12: schema-driven trim/abs repair. */
  def validate(df: DataFrame): DataFrame = Validate.clean(df)

  /** U1 (ApplaudoETL.scala:195-225): per-user category from windowed
    * conditional sums with the reference's integer-division semantics
    * (label applies iff 100% of the user's products are in the set).
    * Result: (user_id, category), one row per user, deterministic. */
  def clientsCategory(validated: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    def condSum(depts: Seq[String]) =
      sum(when(col("department").isin(depts: _*),
        col("number_of_products")).otherwise(0)).over(w)
    val withSums = validated
      .withColumn("total", sum(col("number_of_products")).over(w))
      .withColumn("mom", condSum(MomDepartments))
      .withColumn("single", condSum(SingleDepartments))
      .withColumn("pet", condSum(PetFriendlyDepartments))
    val category = Classify.allOrNothingCategory(
      Seq("Mom" -> col("mom"), "Single" -> col("single"),
        "Pet Friendly" -> col("pet")),
      col("total"), "A complete mystery")
    withSums.withColumn("category", category)
      .select(col("user_id"), col("category"))
      .dropDuplicates(Seq("user_id"))
  }

  /** U2 + A3 (ApplaudoETL.scala:231-264): per-day exact quartiles of
    * number_of_products (ONE job, not 7), broadcast-joined; per-user
    * windowed total; strict `>` thresholds with the reference's dspo
    * gaps at {8, 9, 20}.
    *
    * `deterministic=true` resolves the reference's arbitrary-row
    * dropDuplicates (SURVEY.md §3.3) by keeping each user's row with
    * the highest (order_number, order_id); default preserves
    * reference-compatible any-row semantics.
    */
  def clientsSegmentation(validated: DataFrame,
                          deterministic: Boolean = false,
                          interpolatedQuantiles: Boolean = false): DataFrame = {
    // default: element-based quantiles — the reference's
    // approxQuantile(err=0) convention, all 7 days x 3 quartiles in one
    // job. `interpolatedQuantiles` switches to percentile_cont (==
    // DuckDB quantile_cont) for cross-engine-exact oracle gating; both
    // flavors feed the same strict-> comparisons.
    val thresholds = (if (interpolatedQuantiles)
        Quantiles.perGroup(validated, "order_dow",
          "number_of_products", Seq(0.25, 0.5, 0.75))
      else
        Quantiles.perGroupElement(validated, "order_dow",
          "number_of_products", Seq(0.25, 0.5, 0.75)))
      .withColumnRenamed("order_dow", "dow")
    val withTotal = validated.withColumn("total_products_bought",
      sum(col("number_of_products")).over(Window.partitionBy("user_id")))
    val joined = withTotal.join(broadcast(thresholds),
      col("order_dow") === col("dow"))
    val dspo = col("days_since_prior_order")
    val segment =
      when(dspo <= 7 && col("total_products_bought") > col("q75"),
        "You've Got a Friend in Me")
      .when(dspo.between(10, 19) && col("total_products_bought") > col("q50"),
        "Baby come Back")
      .when(dspo > 20 && col("total_products_bought") > col("q25"),
        "Special Offers")
      .otherwise("Undefined")
    val segmented = joined.withColumn("client_segment", segment)
    if (deterministic) {
      val pick = Window.partitionBy("user_id")
        .orderBy(col("order_number").desc, col("order_id").desc)
      segmented.withColumn("__rn", row_number().over(pick))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("client_segment"))
    } else {
      segmented.select(col("user_id"), col("client_segment"))
        .dropDuplicates(Seq("user_id"))
    }
  }

  /** J2 (ApplaudoETL.scala:59): merge the two per-user classifications. */
  def clients(category: DataFrame, segmentation: DataFrame): DataFrame =
    category.join(segmentation, Seq("user_id"))

  /** Full pipeline: sources -> products + clients frames. The validated
    * frame is cached: three downstream consumers (products sink,
    * category, segmentation+quantiles) would otherwise re-read and
    * re-explode every source. */
  def run(spark: SparkSession, blobOrders: DataFrame, dbOrders: DataFrame,
          productDim: DataFrame,
          deterministicSegments: Boolean = false,
          interpolatedQuantiles: Boolean = false): (DataFrame, DataFrame) = {
    val merged = mergeAndTransform(blobOrders, dbOrders)
    val products = validate(joinProductDetails(merged, productDim)).cache()
    val cat = clientsCategory(products)
    val seg = clientsSegmentation(products, deterministicSegments,
      interpolatedQuantiles)
    (products, clients(cat, seg))
  }
}
