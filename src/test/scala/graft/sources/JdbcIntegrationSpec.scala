package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** Real JDBC round-trip through an embedded Derby database: the
  * pushdown watermark subquery executes ON the database and the read
  * is split into range-parallel partitions — the two behaviors
  * `JdbcSource` exists to provide (reference S4).
  */
class JdbcIntegrationSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private lazy val seeded: Unit = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE order_details (order_id BIGINT, user_id BIGINT, qty VARCHAR(10))")
      val ins = conn.prepareStatement(
        "INSERT INTO order_details VALUES (?, ?, ?)")
      (1L to 100L).foreach { i =>
        ins.setLong(1, i); ins.setLong(2, i % 7); ins.setString(3, i.toString)
        ins.executeUpdate()
      }
    } finally conn.close()
  }

  test("watermark subquery filters server-side; range partitioning splits the read") {
    seeded
    val src = JdbcSource(url, "order_details", "", "", driver,
      watermark = Some(("order_id", 60L)),
      partitioning = Some(JdbcPartitioning("order_id", 0L, 101L, 4)))
    val df = src.read(spark)
    assert(df.count() == 40) // only order_id > 60 came back
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("order_id").collect().map(_.getLong(0)).min == 61L)
  }

  test("all-string JDBC schema normalizes by per-column cast") {
    seeded
    val src = JdbcSource(url, "order_details", "", "", driver)
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("order_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qty",
        org.apache.spark.sql.types.IntegerType)))
    val cast = JdbcSource.castTo(src.read(spark), target)
    assert(cast.schema.fields.map(_.dataType).toSeq == target.fields.map(_.dataType).toSeq)
    assert(cast.count() == 100)
  }
}
