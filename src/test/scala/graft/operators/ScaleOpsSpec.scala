package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "vb")
    // warehouse dirs outlive the in-memory catalog across JVM runs
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists) {
        dir.listFiles.foreach(_.delete()); dir.delete()
      }
    }
    ScaleOps.writeBucketed(a, "bkt_a", Seq("k"), 8)
    ScaleOps.writeBucketed(b, "bkt_b", Seq("k"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin result identical to plain join") {
    val big = (1 to 5000).map(i => (i % 7L, i)).toDF("k", "v")
    val small = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = ScaleOps.saltedJoin(big, small, "k", 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 5000)
  }

  test("saltedSum equals plain grouped sum") {
    val df = (1 to 5000).map(i => (i % 3L, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = ScaleOps.saltedSum(df, Seq("k"), "v", "s", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
