package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CREATE/REFRESH/DROP MATERIALIZED VIEW ([[GraftMv]] +
  * [[GraftSqlParser]]): the SQL statement surface over the
  * incremental-view-maintenance layer. */
class GraftMvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val w = Files.createTempDirectory("graft_mv").toString
    spark.conf.set("spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.warehouse", w)
    (1L to 100L).map(i => (i, i % 7, i * 3))
      .toDF("k", "seg", "amount").createOrReplaceTempView("mv_src")
    spark.sql("CREATE TABLE gmv.events AS SELECT * FROM mv_src")
    "gmv"
  }

  test("single-table MV: create reads back the aggregate; a source " +
    "commit is invisible until REFRESH; refresh == recompute") {
    cat
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.seg_totals AS " +
      s"SELECT seg, count(*) AS cnt, sum(amount) AS sum_amount " +
      s"FROM $cat.events GROUP BY seg")
    def inlined(): Map[Long, (Long, Long)] =
      spark.sql(s"SELECT seg, count(*) AS cnt, sum(amount) AS " +
        s"sum_amount FROM $cat.events GROUP BY seg").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def mv(): Map[Long, (Long, Long)] =
      spark.sql(s"SELECT seg, cnt, sum_amount FROM $cat.seg_totals")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val v0 = inlined()
    assert(mv() == v0)
    // source moves; the MV is a SNAPSHOT until refreshed
    spark.sql(s"INSERT INTO $cat.events VALUES (999, 3, 1000)")
    assert(mv() == v0, "an unrefreshed MV must keep its snapshot")
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.seg_totals")
    assert(mv() == inlined())
    // the CALL spelling works too, and is a no-op when caught up
    val v = spark.sql(s"CALL $cat.system.refresh_mv('seg_totals')")
      .collect().head.getLong(0)
    assert(v == VersionedTable.versions(spark,
      spark.conf.get("spark.sql.catalog.gmv.warehouse") +
        "/seg_totals").last.toLong)
  }

  test("join MV over two tables: dimension AND fact commits fold in " +
    "on refresh") {
    cat
    (1L to 100L).map(i => (i % 10, s"s${i % 3}"))
      .distinct.toDF("k", "grp").createOrReplaceTempView("mv_dim_src")
    spark.sql(s"CREATE TABLE $cat.dims AS SELECT * FROM mv_dim_src")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.grp_rev AS " +
      s"SELECT grp, count(*) AS cnt, sum(amount) AS sum_amount " +
      s"FROM $cat.events JOIN $cat.dims USING (k) GROUP BY grp")
    def inlined(): Set[(String, Long, Long)] =
      spark.sql(s"SELECT grp, count(*) AS cnt, sum(amount) AS " +
        s"sum_amount FROM $cat.events JOIN $cat.dims USING (k) " +
        "GROUP BY grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def mv(): Set[(String, Long, Long)] =
      spark.sql(s"SELECT grp, cnt, sum_amount FROM $cat.grp_rev")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mv() == inlined())
    spark.sql(s"INSERT INTO $cat.events VALUES (7, 1, 5000)")
    spark.sql(s"INSERT INTO $cat.dims VALUES (999, 's9')")
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.grp_rev")
    assert(mv() == inlined())
  }

  test("unmaintainable shapes and non-canonical aliases refuse at " +
    "CREATE time with the contract in the message") {
    cat
    def rejected(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejected(s"CREATE MATERIALIZED VIEW $cat.bad1 AS " +
      s"SELECT k, amount FROM $cat.events",
      "not incrementally maintainable")
    rejected(s"CREATE MATERIALIZED VIEW $cat.bad2 AS " +
      s"SELECT seg, max(amount) AS mx FROM $cat.events GROUP BY seg",
      "not incrementally maintainable")
    rejected(s"CREATE MATERIALIZED VIEW $cat.bad3 AS " +
      s"SELECT seg, count(*) AS n, sum(amount) AS sum_amount " +
      s"FROM $cat.events GROUP BY seg", "cnt")
    rejected(s"CREATE MATERIALIZED VIEW $cat.bad4 AS " +
      s"SELECT seg, count(*) AS cnt, sum(amount) AS total " +
      s"FROM $cat.events GROUP BY seg", "sum_amount")
    rejected(s"CREATE MATERIALIZED VIEW $cat.bad5 AS " +
      s"SELECT seg, sum(amount) AS sum_amount " +
      s"FROM $cat.events GROUP BY seg", "count(*) AS cnt")
    // every refused CREATE left nothing behind
    (1 to 5).foreach { i =>
      assert(!GraftMv.isTableDir(spark,
        spark.conf.get("spark.sql.catalog.gmv.warehouse") + s"/bad$i"))
    }
  }

  test("DROP MATERIALIZED VIEW removes the view; a plain table " +
    "refuses; IF EXISTS tolerates absence; re-CREATE works") {
    cat
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.droppable AS " +
      s"SELECT seg, count(*) AS cnt FROM $cat.events GROUP BY seg")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.droppable")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.droppable").collect()
    }
    spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.droppable")
    intercept[Exception] {
      spark.sql(s"DROP MATERIALIZED VIEW $cat.droppable")
    }
    val e = intercept[Exception] {
      spark.sql(s"DROP MATERIALIZED VIEW $cat.events")
    }
    assert(e.getMessage.contains("DROP TABLE"), e.getMessage)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.droppable AS " +
      s"SELECT seg, count(*) AS cnt FROM $cat.events GROUP BY seg")
    assert(spark.sql(s"SELECT count(*) FROM $cat.droppable")
      .as[Long].head() == 7L)
    // CREATE over an existing MV refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql(s"CREATE MATERIALIZED VIEW $cat.droppable AS " +
        s"SELECT seg, count(*) AS cnt FROM $cat.events GROUP BY seg")
    }
    spark.sql(s"CREATE MATERIALIZED VIEW IF NOT EXISTS $cat.droppable " +
      s"AS SELECT seg, count(*) AS cnt FROM $cat.events GROUP BY seg")
  }
}
