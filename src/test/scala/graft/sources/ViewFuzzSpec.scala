package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-fuzz of the SQL view surface: seeded random view
  * definitions — filters, projections, aggregates, declared column
  * lists, view-over-view chains — each created through the catalog
  * and read back BOTH ways, through the view and as the inlined
  * query, which must be row-identical. What the fixed GraftViewSpec
  * fixtures can't prove: that substitution + creation-context
  * scoping + alias application hold across arbitrary definition
  * shapes, not just the handful the fixtures chose. */
class ViewFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("random view definitions read-through == inlined (3 seeds x " +
    "8 views each, incl. chained views)") {
    val w = Files.createTempDirectory("graft_viewfuzz").toString
    spark.conf.set("spark.sql.catalog.gvf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvf.warehouse", w)
    (1L to 500L).map(i => (i, i * 7 % 101, s"g${i % 13}"))
      .toDF("k", "v", "grp").createOrReplaceTempView("vf_src")
    spark.sql("CREATE TABLE gvf.base AS SELECT * FROM vf_src")

    def hashOf(sql: String): (Long, Seq[String]) = {
      val df = spark.sql(sql)
      val cols = df.columns.toSeq.sorted
      val h = df.select(cols.map(col): _*)
        .withColumn("__h", hash(cols.map(col): _*))
        .agg(sum(col("__h").cast("long")), count(lit(1))).collect()(0)
      (h.getLong(0) * 31 + h.getLong(1), cols)
    }

    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      for (i <- 1 to 8) {
        val name = s"vz_${seed}_$i"
        val filt = rnd.nextInt(4) match {
          case 0 => s"k % ${2 + rnd.nextInt(9)} = ${rnd.nextInt(2)}"
          case 1 => s"v >= ${rnd.nextInt(80)}"
          case 2 => s"grp IN ('g${rnd.nextInt(13)}', 'g${rnd.nextInt(13)}')"
          case _ => s"k <= ${100 + rnd.nextInt(400)}"
        }
        // half the views chain on the PREVIOUS view instead of base
        val src = if (i > 1 && rnd.nextBoolean() && rnd.nextInt(3) == 0)
          s"gvf.vz_${seed}_${i - 1}" else "gvf.base"
        val (body, aliased) = rnd.nextInt(3) match {
          case 0 =>
            (s"SELECT k, v FROM $src WHERE $filt", false)
          case 1 =>
            (s"SELECT grp, CAST(sum(v) AS BIGINT) AS sv, count(*) AS c " +
              s"FROM $src WHERE $filt GROUP BY grp", false)
          case _ =>
            (s"SELECT k, v + 1 FROM $src WHERE $filt", true)
        }
        // chained views may not expose (k, v): fall back when the
        // previous view's shape doesn't fit this body
        val usable = try { spark.sql(body); true }
          catch { case _: Exception => false }
        val finalBody = if (usable) body
          else s"SELECT k, v FROM gvf.base WHERE $filt"
        val colList = if (aliased) " (ck, cv)" else ""
        spark.sql(s"CREATE OR REPLACE VIEW gvf.$name$colList AS $finalBody")
        val through = hashOf(s"SELECT * FROM gvf.$name")
        // inline: the same body, aliased the same way
        val inline = hashOf(
          if (aliased) s"SELECT * FROM ($finalBody) AS t(ck, cv)"
          else finalBody)
        assert(through == inline,
          s"seed=$seed view=$name body=$finalBody: " +
            s"through=$through inline=$inline")
      }
    }
  }
}
