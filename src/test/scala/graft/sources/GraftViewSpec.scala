package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** SQL views over the versioned catalog ([[GraftViews]] +
  * [[GraftViewRule]]): CREATE/ALTER/DROP/SHOW, read substitution with
  * creation-context scoping, persistence across sessions of the same
  * warehouse, and the table-xor-view guards. */
class GraftViewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_views").toString
    spark.conf.set("spark.sql.catalog.gv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gv.warehouse", w)
    (1L to 100L).map(i => (i, i * 2, s"r${i % 3}"))
      .toDF("k", "v", "region").createOrReplaceTempView("view_src")
    spark.sql("CREATE TABLE gv.base AS SELECT * FROM view_src")
    w
  }

  test("CREATE VIEW / SELECT through it == the inlined query") {
    warehouse
    spark.sql("CREATE VIEW gv.v_sum AS " +
      "SELECT region, sum(v) AS total FROM gv.base GROUP BY region")
    val through = spark.sql(
      "SELECT * FROM gv.v_sum ORDER BY region").collect()
    val inline = spark.sql(
      "SELECT region, sum(v) AS total FROM gv.base GROUP BY region " +
        "ORDER BY region").collect()
    assert(through.sameElements(inline))
    // the view composes like any relation
    assert(spark.sql("SELECT count(*) FROM gv.v_sum WHERE total > 0")
      .as[Long].head() == 3L)
    // a view is not a write target
    intercept[Exception] {
      spark.sql("INSERT INTO gv.v_sum VALUES ('rX', 1)")
    }
  }

  test("declared column list renames the output; OR REPLACE swaps; " +
    "DROP removes; IF NOT EXISTS is a no-op") {
    warehouse
    spark.sql("CREATE VIEW gv.v_cols (kk, vv) AS " +
      "SELECT k, v FROM gv.base WHERE k <= 3")
    assert(spark.sql("SELECT * FROM gv.v_cols").columns.toSeq ==
      Seq("kk", "vv"))
    assert(spark.sql("SELECT sum(kk) FROM gv.v_cols")
      .as[Long].head() == 6L)
    spark.sql("CREATE OR REPLACE VIEW gv.v_cols AS " +
      "SELECT k FROM gv.base WHERE k > 90")
    assert(spark.sql("SELECT count(*) FROM gv.v_cols")
      .as[Long].head() == 10L)
    // IF NOT EXISTS on an existing name: definition unchanged
    spark.sql("CREATE VIEW IF NOT EXISTS gv.v_cols AS " +
      "SELECT 1 AS one")
    assert(spark.sql("SELECT count(*) FROM gv.v_cols")
      .as[Long].head() == 10L)
    // a duplicate without the clause refuses
    intercept[Exception] {
      spark.sql("CREATE VIEW gv.v_cols AS SELECT 1 AS one")
    }
    spark.sql("DROP VIEW gv.v_cols")
    intercept[Exception] {
      spark.sql("SELECT * FROM gv.v_cols").collect()
    }
    spark.sql("DROP VIEW IF EXISTS gv.v_cols") // no-op, no error
  }

  test("ALTER VIEW AS redefines; SET/UNSET TBLPROPERTIES round-trip") {
    warehouse
    spark.sql("CREATE VIEW gv.v_alter AS SELECT k FROM gv.base")
    spark.sql("ALTER VIEW gv.v_alter AS " +
      "SELECT k, v FROM gv.base WHERE k <= 5")
    assert(spark.sql("SELECT sum(v) FROM gv.v_alter")
      .as[Long].head() == 30L)
    spark.sql(
      "ALTER VIEW gv.v_alter SET TBLPROPERTIES ('note' = 'five rows')")
    val cat = GraftSqlShims_catalog()
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "v_alter")
    assert(cat.loadView(ident).properties().get("note") == "five rows")
    spark.sql("ALTER VIEW gv.v_alter UNSET TBLPROPERTIES ('note')")
    assert(!cat.loadView(ident).properties().containsKey("note"))
  }

  private def GraftSqlShims_catalog(): GraftCatalog =
    org.apache.spark.sql.GraftSqlShims.lookupCatalog(spark, "gv")
      .get.asInstanceOf[GraftCatalog]

  test("views persist in the warehouse: a second catalog instance " +
    "over the same path serves them") {
    warehouse
    spark.sql("CREATE VIEW gv.v_persist AS " +
      "SELECT count(*) AS n FROM gv.base")
    spark.conf.set("spark.sql.catalog.gv2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gv2.warehouse", warehouse)
    // the stored creation context pins 'gv' names; the new catalog
    // name reads the same definition
    assert(spark.sql("SELECT n FROM gv2.v_persist")
      .as[Long].head() == 100L)
  }

  test("views over views; SHOW VIEWS lists; time travel inside the " +
    "body works, ON the view is refused") {
    warehouse
    spark.sql("CREATE VIEW gv.v_inner AS " +
      "SELECT k, v FROM gv.base WHERE k <= 50")
    spark.sql("CREATE VIEW gv.v_outer AS " +
      "SELECT sum(v) AS s FROM gv.v_inner")
    assert(spark.sql("SELECT s FROM gv.v_outer")
      .as[Long].head() == (1L to 50L).map(_ * 2).sum)
    val shown = spark.sql("SHOW VIEWS IN gv").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("v_inner") && shown.contains("v_outer"), shown)
    // a view body may pin a table VERSION
    spark.sql("INSERT INTO gv.base VALUES (999, 999, 'rX')")
    spark.sql("CREATE VIEW gv.v_pinned AS " +
      "SELECT count(*) AS n FROM gv.base VERSION AS OF 1")
    assert(spark.sql("SELECT n FROM gv.v_pinned").as[Long].head() == 100L)
    assert(spark.sql("SELECT count(*) FROM gv.base")
      .as[Long].head() == 101L)
    // ...but the VIEW itself has no history
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gv.v_pinned VERSION AS OF 1").collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage))
      .mkString("|")
    assert(chain.contains("is a VIEW"), chain)
  }

  test("a name is a table XOR a view — both directions refuse") {
    warehouse
    spark.sql("CREATE VIEW gv.v_xor AS SELECT 1 AS one")
    intercept[Exception] {
      spark.sql("CREATE TABLE gv.v_xor AS SELECT 2 AS two")
    }
    intercept[Exception] {
      spark.sql("CREATE VIEW gv.base AS SELECT 1 AS one")
    }
    // and the metadata dir itself is never a table name
    intercept[Exception] {
      spark.sql("CREATE TABLE gv._views AS SELECT 1 AS one")
    }
  }

  test("ALTER VIEW RENAME moves the definition; SHOW CREATE TABLE " +
    "prints re-creatable DDL") {
    warehouse
    spark.sql("CREATE VIEW gv.v_old (kk) AS SELECT k FROM gv.base " +
      "WHERE k <= 2")
    spark.sql("ALTER VIEW gv.v_old RENAME TO v_new")
    assert(spark.sql("SELECT sum(kk) FROM gv.v_new").as[Long].head() == 3L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gv.v_old").collect()
    }
    val ddl = spark.sql("SHOW CREATE TABLE gv.v_new")
      .collect().head.getString(0)
    assert(ddl.contains("CREATE VIEW gv.v_new (kk) AS") &&
      ddl.contains("SELECT k FROM gv.base"), ddl)
    // renaming onto an existing table or view refuses
    spark.sql("CREATE VIEW gv.v_taken AS SELECT 1 AS one")
    intercept[Exception] {
      spark.sql("ALTER VIEW gv.v_new RENAME TO v_taken")
    }
    intercept[Exception] {
      spark.sql("ALTER VIEW gv.v_new RENAME TO base")
    }
    assert(spark.sql("SELECT sum(kk) FROM gv.v_new").as[Long].head() == 3L,
      "a refused rename must leave the view intact")
  }

  test("relative names in the body resolve in the CREATION context") {
    warehouse
    spark.sql("USE gv")
    try {
      spark.sql("CREATE VIEW rel_v AS SELECT max(k) AS mk FROM base")
      assert(spark.sql("SELECT mk FROM rel_v").as[Long].head() >= 100L)
    } finally spark.sql("USE spark_catalog")
    // read works fully-qualified from the default context too
    assert(spark.sql("SELECT mk FROM gv.rel_v").as[Long].head() >= 100L)
  }

  test("a CTE inside the view body substitutes on read — it is never " +
    "qualified into a phantom table name") {
    warehouse
    spark.sql("CREATE VIEW gv.v_cte AS " +
      "WITH t AS (SELECT k, v FROM gv.base WHERE k <= 4) " +
      "SELECT sum(v) AS sv FROM t")
    assert(spark.sql("SELECT sv FROM gv.v_cte").as[Long].head() == 20L)
    // the view composes under an OUTER query that has its own CTE of
    // the same name — scopes stay separate
    assert(spark.sql(
      "WITH t AS (SELECT 1 AS x) SELECT sv FROM gv.v_cte CROSS JOIN t")
      .select("sv").as[Long].head() == 20L)
    // a CTE name in the body never shadows a REAL table referenced
    // outside the WITH scope... and relative names beside the CTE
    // still qualify by creation context
    val body = "WITH big AS (SELECT k FROM gv.base WHERE k > 98) " +
      "SELECT (SELECT count(*) FROM big) AS nbig, max(k) AS mk " +
      "FROM gv.base"
    spark.sql(s"CREATE VIEW gv.v_cte2 AS $body")
    assert(spark.sql("SELECT nbig, mk FROM gv.v_cte2").head() ==
      spark.sql(body).head())
  }

  test("a name explicitly qualified by ANOTHER catalog is never " +
    "claimed while a graft catalog is current") {
    warehouse
    spark.sql("USE gv")
    try {
      // routes to the session catalog, not to a graft view named
      // `<cur-ns>.spark_catalog.default.v_other`
      spark.sql("CREATE VIEW spark_catalog.default.v_other AS " +
        "SELECT 42 AS answer")
      assert(spark.sql("SELECT answer FROM spark_catalog.default.v_other")
        .as[Int].head() == 42)
      assert(GraftViews.list(spark, warehouse,
        Seq("spark_catalog", "default")).isEmpty,
        "the session-catalog view must not land in the graft warehouse")
      spark.sql("DROP VIEW spark_catalog.default.v_other")
    } finally spark.sql("USE spark_catalog")
  }

  test("DROP VIEW on a graft TABLE fails with the wrong-object-type " +
    "error — with and without IF EXISTS — instead of no-opping") {
    warehouse
    val before = spark.sql("SELECT count(*) FROM gv.base").as[Long].head()
    val e1 = intercept[Exception] { spark.sql("DROP VIEW gv.base") }
    assert(e1.getMessage.contains("DROP TABLE"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("DROP VIEW IF EXISTS gv.base")
    }
    assert(e2.getMessage.contains("DROP TABLE"), e2.getMessage)
    assert(spark.sql("SELECT count(*) FROM gv.base").as[Long].head()
      == before, "the table must be untouched")
  }
}
