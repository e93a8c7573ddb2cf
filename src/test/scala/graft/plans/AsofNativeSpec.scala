package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(("A", 1L, 10L), ("A", 5L, 11L), ("B", 3L, 20L))
    .toDF("sym", "t", "px")
    .select(xxhash64($"sym").as("k"), $"t", $"px") // LongType key
  private def trades = Seq(("A", 0L, 100L), ("A", 5L, 200L), ("A", 6L, 300L),
    ("B", 9L, 400L)).toDF("sym", "t", "qty")
    .select(xxhash64($"sym").as("k"), $"t", $"qty")

  test("native as-of == union+window as-of (backward, inclusive, ties to right)") {
    val native = AsOf.asofJoinNative(trades, quotes, "k", "t", Seq("px"))
      .select($"k", $"t", $"qty", $"px")
      .collect().map(_.toSeq).toSet
    val composed = AsOf.asofJoin(trades, quotes, "k", "t", Seq("px"))
      .select($"k", $"t", $"qty", $"px")
      .collect().map(_.toSeq).toSet
    assert(native == composed)
    assert(native.size == 4)
  }

  test("physical plan: AsofJoinExec fed by hash exchange + (key, order) sort") {
    val out = AsOf.asofJoinNative(trades, quotes, "k", "t", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(1200)) // exec prints sans "Exec"
    assert(plan.contains("hashpartitioning"), plan.take(1200))
    assert(plan.contains("Sort"), plan.take(1200))
  }

  test("self-as-of (both sides from one relation) matches the composed form") {
    val e = graft.Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us")
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id", $"ts_us", $"ts_us".as("signup_us"))
    val native = AsOf.asofJoinNative(purchases, signups, "user_id", "ts_us",
        Seq("signup_us"))
      .collect().map(_.toSeq).toSet
    val composed = AsOf.asofJoin(purchases, signups, "user_id", "ts_us",
        Seq("signup_us"))
      .select($"event_id", $"user_id", $"ts_us", $"signup_us")
      .collect().map(_.toSeq).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }
}
