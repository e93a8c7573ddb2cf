package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Source
import org.apache.spark.sql.{DataFrame, SparkSession}

class GraftEtlSpec extends SparkSpec {
  import spark.implicits._

  private case class FrameSource(df: DataFrame) extends Source {
    override def read(spark: SparkSession): DataFrame = df
  }

  private def blob = Seq(
    (1001L, 1L, 1, 0, 8, 5.0f, "Milk|dairy|3~Bread|bakery|2"),
    (1002L, 2L, 1, 1, 24, 8.0f, "Beer|drinks|6")
  ).toDF("order_id", "user_id", "order_number", "order_dow",
    "order_hour_of_day", "days_since_prior_order", "order_detail")

  private def db = Seq(
    ("2001", "3", "1", "0", "-14", "12.0", "Chips|snack aisle|10")
  ).toDF("order_id", "user_id", "order_number", "order_dow",
    "order_hour_of_day", "days_since_prior_order", "order_detail")

  private def dim = Seq(
    ("Milk", "dairy", "dairy eggs"), ("Bread", "bakery aisle", "bakery"),
    ("Beer", "drinks", "alcohol"), ("Chips", "snack aisle", "snacks")
  ).toDF("product_name", "aisle", "department")

  test("start() runs the whole pipeline and stores both tables") {
    val out = Files.createTempDirectory("graft_etl").toString
    new GraftEtl(spark, FrameSource(blob), FrameSource(db), FrameSource(dim),
      Some(out), deterministicSegments = true).start()
    val products = spark.read.parquet(s"$out/products")
    val clients = spark.read.parquet(s"$out/clients")
    assert(products.count() == 4) // 2+2+... exploded items: 2 + 1 + 1
    assert(products.columns.contains("department"))
    assert(clients.columns.toSeq.sorted ==
      Seq("category", "client_segment", "user_id"))
    assert(clients.count() == 3) // one row per user
  }

  test("CLI parse mirrors the reference contract") {
    assert(GraftEtlMain.parseArgs(Nil) == None)
    assert(GraftEtlMain.parseArgs(List("-r", "/tmp/x")) == Some("/tmp/x"))
    intercept[IllegalArgumentException] {
      GraftEtlMain.parseArgs(List("--bogus"))
    }
  }
}
