package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic star-schema tables (TESTDATA.md).
  *
  * One parquet file per logical table under `dir`. At cluster scale each of
  * these would be a partitioned/bucketed parquet dataset; the loader shape
  * (schema-on-read parquet, column pruning + filter pushdown left to
  * Catalyst) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped in two physical layouts: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as
    * raw long nanos via the legacy conf) and native TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ). Both normalize to the same logical
    * contract downstream code and every oracle relies on: `ts` as a
    * proper TimestampType (micros precision, matching DuckDB's
    * timestamp view of the column) and `ts_ns` as the exact integer
    * epoch-nanos for deterministic epoch-domain time math.
    *
    * NTZ wall time is interpreted as a UTC instant — all harnesses
    * (Verify, Bench, SparkSpec) pin spark.sql.session.timeZone=UTC,
    * which DuckDB's epoch_ns(naive timestamp) agrees with.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsNs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("ts") // legacy NANOS layout
      case _ =>
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts AS timestamp)) * 1000")
    }
    raw
      .withColumn("ts_ns", tsNs)
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts_ns DIV 1000)"))
      .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
