package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{CsvWatermarkSource, HttpJsonSource, JdbcPartitioning, JdbcSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end reference-parity test on FIXTURES.md-shaped local data:
  * the full products + clients pipeline, validated against independent
  * driver-side "UDF twin" oracles implementing the reference's exact
  * semantics (ApplaudoETL.scala:200-211, 234-245) including integer
  * division and dspo gaps.
  */
class ReferenceEtlSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixtures (F1/F2/F3 shapes) -------------------------------------
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-orders").toFile
    def write(name: String, rows: Seq[String]): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f, "UTF-8")
      rows.foreach(w.println); w.close()
    }
    write("00.csv", Seq(
      "1001,1,1,0,8,5.0,Milk|dairy|3~Bread|bakery|2",
      "1002,2,1,1,24,8.0,Beer|drinks|6",
      "1003,3,1,2,10,3.0,DogFood|pet aisle|4",
      "badrow,notenough")) // malformed -> DROPMALFORMED
    write("01.csv", Seq(
      "1004,4,2,3,9,25.0,Milk|dairy|1~Beer|drinks|1",
      "1005,1,2,4,7,2.5,Egg Carton|dairy|5"))
    write("02.csv", Seq(
      "1006,5,1,5,11,18.0,Café Snäck|intl|2", // non-ASCII -> stripped
      "1007,6,1,6,12,9.0,IceCream|frozen aisle|7",
      "1008,4,3,6,13,0.5,MysteryItem|unknown|1")) // no dim match -> null dept
    dir.getAbsolutePath
  }

  /** JDBC stand-in: all-string columns (F2), negative hours. */
  private lazy val dbOrdersRaw: DataFrame = Seq(
    ("2001", "7", "1", "0", "-14", "12.0", "Chips|snack aisle|10"),
    ("2002", "2", "2", "1", "-7", "21.0", "Canned Soup|canned|3")
  ).toDF("order_id", "user_id", "order_number", "order_dow",
    "order_hour_of_day", "days_since_prior_order", "order_detail")

  private val apiPayload: String =
    """{"results": [{
      |  "columns": [{"name": "PRODUCT_NAME", "type": ""},
      |              {"name": "AISLE", "type": ""},
      |              {"name": "DEPARTMENT", "type": ""}],
      |  "items": [
      |    {"product_name": "Milk", "aisle": "dairy", "department": "dairy eggs"},
      |    {"product_name": "Bread", "aisle": "bakery aisle", "department": "bakery"},
      |    {"product_name": "Egg Carton", "aisle": "dairy", "department": "dairy eggs"},
      |    {"product_name": "Beer", "aisle": "drinks", "department": "alcohol"},
      |    {"product_name": "DogFood", "aisle": "pet aisle", "department": "pets"},
      |    {"product_name": "IceCream", "aisle": "frozen aisle", "department": "frozen"},
      |    {"product_name": "Caf Snck", "aisle": "intl", "department": "snacks"},
      |    {"product_name": "Chips", "aisle": "snack aisle", "department": "snacks"},
      |    {"product_name": "Canned Soup", "aisle": "canned", "department": "canned goods"},
      |    {"product_name": "Ghost Product", "aisle": "nowhere", "department": "household"}
      |  ]}]}""".stripMargin

  private def blobOrders: DataFrame =
    CsvWatermarkSource(fixtureDir, ReferenceEtl.ProductSchema).read(spark)

  private def dbOrders: DataFrame =
    JdbcSource.castTo(dbOrdersRaw, ReferenceEtl.ProductSchema)

  private def dim: DataFrame =
    new HttpJsonSource("unused://", _ => apiPayload).read(spark)

  private lazy val pipeline: (DataFrame, DataFrame) =
    ReferenceEtl.run(spark, blobOrders, dbOrders, dim,
      deterministicSegments = true)

  // ---- source layer ----------------------------------------------------

  test("csv watermark source: file-number filter + DROPMALFORMED") {
    val all = CsvWatermarkSource(fixtureDir, ReferenceEtl.ProductSchema)
    assert(all.fileNames(spark).map(_.split('/').last).toSeq ==
      Seq("00.csv", "01.csv", "02.csv"))
    assert(all.read(spark).collect().length == 8) // 9 lines - 1 malformed
    // note: count() without any parsed column skips malformed detection
    // (CSV column pruning) — materialize rows to exercise DROPMALFORMED
    val inc = CsvWatermarkSource(fixtureDir, ReferenceEtl.ProductSchema,
      fileNumberGt = 0)
    assert(inc.fileNames(spark).map(_.split('/').last).toSeq ==
      Seq("01.csv", "02.csv"))
    assert(inc.read(spark).collect().length == 5)
  }

  test("jdbc source: pushdown subquery + schema normalization") {
    val src = JdbcSource("jdbc:sqlserver://unused", "dbo.order_details",
      "u", "p", "driver", watermark = Some(("order_id", 146023L)),
      partitioning = Some(JdbcPartitioning("order_id", 0, 1000000, 8)))
    assert(src.dbtable ==
      "(select * from dbo.order_details where CAST(order_id AS bigint) > 146023) as t")
    val normalized = dbOrders
    assert(normalized.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      ReferenceEtl.ProductSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // negative hour survives cast (repair happens in validate, not cast)
    assert(normalized.select("order_hour_of_day").as[Int].collect().toSet ==
      Set(-14, -7))
  }

  test("http json source: F3 payload -> (product_name, aisle, department)") {
    val d = dim
    assert(d.columns.toSeq == Seq("product_name", "aisle", "department"))
    assert(d.count() == 10)
    assert(d.filter($"product_name" === "Milk").select("department")
      .as[String].head() == "dairy eggs")
  }

  // ---- products table --------------------------------------------------

  test("products: explode, repairs, left join, validation (F4 golden shape)") {
    val (products, _) = pipeline
    assert(products.columns.toSeq == Seq("order_id", "user_id",
      "order_number", "order_dow", "order_hour_of_day",
      "days_since_prior_order", "product", "aisles", "number_of_products",
      "department"))
    // 8 csv + 2 db order rows -> 12 exploded items (2 multi-item orders)
    assert(products.count() == 12)
    val byId = products.collect().map(r =>
      (r.getLong(0), r.getString(6)) -> r).toMap

    // hour 24 -> 0
    assert(byId((1002L, "Beer")).getInt(4) == 0)
    // negative db hours -> abs
    assert(byId((2001L, "Chips")).getInt(4) == 14)
    assert(byId((2002L, "Canned Soup")).getInt(4) == 7)
    // non-ASCII stripped and dim matched
    assert(byId.contains((1006L, "Caf Snck")))
    assert(byId((1006L, "Caf Snck")).getString(9) == "snacks")
    // float dspo truncated to int
    assert(byId((1005L, "Egg Carton")).getInt(5) == 2)
    assert(byId((1008L, "MysteryItem")).getInt(5) == 0)
    // unmatched product keeps row, null department (left join)
    assert(byId((1008L, "MysteryItem")).isNullAt(9))
  }

  // ---- clients table vs independent UDF-twin oracles ------------------

  /** Reference clientsCategoryUdf, bit-for-bit (Scala Int division). */
  private def refCategory(total: Int, mom: Int, single: Int, pet: Int): String =
    if (total != 0 && mom / total > 0.5) "Mom"
    else if (total != 0 && single / total > 0.6) "Single"
    else if (total != 0 && pet / total > 0.3) "Pet Friendly"
    else "A complete mystery"

  /** Reference clientsSegmentUdf, including dspo gaps {8,9,20}. */
  private def refSegment(dow: Int, dspo: Int, total: Int,
                         m: Map[(String, Int), Double]): String =
    if (dspo <= 7 && total > m(("third", dow))) "You've Got a Friend in Me"
    else if (dspo >= 10 && dspo <= 19 && total > m(("second", dow))) "Baby come Back"
    else if (dspo > 20 && total > m(("first", dow))) "Special Offers"
    else "Undefined"

  test("clients: category + segmentation match the UDF-twin oracles") {
    val (products, clientsDf) = pipeline
    val rows = products.collect().map { r =>
      (r.getLong(1), r.getInt(3), r.getInt(5),
        if (r.isNullAt(9)) null else r.getString(9), r.getInt(8))
    } // (user, dow, dspo, department, n)

    // oracle categories via integer-division semantics
    val expectedCat = rows.groupBy(_._1).map { case (u, rs) =>
      val total = rs.map(_._5).sum
      def s(set: Seq[String]) = rs.filter(r => set.contains(r._4)).map(_._5).sum
      u -> refCategory(total, s(ReferenceEtl.MomDepartments),
        s(ReferenceEtl.SingleDepartments), s(ReferenceEtl.PetFriendlyDepartments))
    }

    // oracle thresholds via the reference's own 7-action method
    val m = scala.collection.mutable.Map[(String, Int), Double]()
    val cached = products.cache()
    for (day <- 0 to 6) {
      val sub = cached.filter($"order_dow" === day)
      if (sub.count() > 0) {
        val qs = sub.stat.approxQuantile("number_of_products",
          Array(0.25, 0.5, 0.75), 0.0)
        m(("first", day)) = qs(0); m(("second", day)) = qs(1)
        m(("third", day)) = qs(2)
      }
    }
    val totals = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._5).sum }
    // deterministic variant keeps the max (order_number, order_id) row;
    // recompute which row that is per user from the products frame
    val pickRow = products.collect().map { r =>
      (r.getLong(1), r.getInt(2), r.getLong(0), r.getInt(3), r.getInt(5))
    }.groupBy(_._1).map { case (u, rs) =>
      val best = rs.maxBy(t => (t._2, t._3))
      u -> refSegment(best._4, best._5, totals(u), m.toMap.withDefaultValue(Double.MaxValue))
    }

    val got = clientsDf.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got.keySet == expectedCat.keySet)
    got.foreach { case (u, (cat, seg)) =>
      assert(cat == expectedCat(u), s"category user $u")
      assert(seg == pickRow(u), s"segment user $u")
    }
    // spot-check the designed outcomes
    assert(got(1L)._1 == "Mom")
    assert(got(3L)._1 == "Pet Friendly")
    assert(got(4L)._1 == "A complete mystery")
    assert(got(5L)._1 == "Single")
  }

  test("one-job element quantiles == reference's per-day approxQuantile(0.0)") {
    val (products, _) = pipeline
    val oneJob = graft.operators.Quantiles.perGroupElement(products,
        "order_dow", "number_of_products", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1).toDouble, r.getInt(2).toDouble, r.getInt(3).toDouble)).toMap
    for (day <- oneJob.keys) {
      val qs = products.filter($"order_dow" === day)
        .stat.approxQuantile("number_of_products", Array(0.25, 0.5, 0.75), 0.0)
      assert(oneJob(day) == ((qs(0), qs(1), qs(2))), s"dow $day")
    }
  }
}
