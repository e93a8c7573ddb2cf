package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 31L), (3L, 32L), (4L, 100L))
    .toDF("pid", "d")
  private def intervals = Seq((10L, 0L, 5L), (11L, 5L, 40L), (12L, 32L, 32L),
    (13L, 33L, 99L), (14L, 100L, 200L)).toDF("iid", "lo", "hi")

  private def withRule[A](width: Long)(body: => A): A = {
    RangeJoinRuleInstaller.install(spark)
    spark.conf.set(RangeJoinRule.WidthConf, width.toString)
    try body finally spark.conf.set(RangeJoinRule.WidthConf, "0")
  }

  test("BETWEEN theta join is rewritten to an equi-join on the cell") {
    val expected = points.join(intervals, $"d" >= $"lo" && $"d" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(32) {
      val out = points.join(intervals, $"d" >= $"lo" && $"d" <= $"hi")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(1200))
      val rows = out.select($"pid", $"iid").as[(Long, Long)].collect().toSeq
      assert(rows.sorted == expected) // exact multiset: no dups, no losses
    }
  }

  test("strict bounds and flipped spellings are rewritten too") {
    val cond = $"lo" < $"d" && $"hi" > $"d"
    val expected = points.join(intervals, cond)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(32) {
      val out = points.join(intervals, cond)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
      assert(out.select($"pid", $"iid").as[(Long, Long)]
        .collect().toSeq.sorted == expected)
    }
  }

  test("date-typed BETWEEN joins are rewritten (epoch-day cells)") {
    val evts = Seq((1L, "2024-01-05"), (2L, "2024-03-01"), (3L, "2024-07-15"))
      .toDF("eid", "d").select($"eid", to_date($"d").as("d"))
    val periods = Seq((10L, "2024-01-01", "2024-01-31"),
      (11L, "2024-02-15", "2024-03-10"), (12L, "2024-07-15", "2024-07-15"))
      .toDF("pid", "lo", "hi")
      .select($"pid", to_date($"lo").as("lo"), to_date($"hi").as("hi"))
    val cond = $"d" >= $"lo" && $"d" <= $"hi"
    val expected = evts.join(periods, cond)
      .select($"eid", $"pid").as[(Long, Long)].collect().toSeq.sorted
    withRule(30) {
      val out = evts.join(periods, cond)
      assert(out.queryExecution.optimizedPlan.toString.contains("__graft_cell"),
        "rewrite must fire for date columns")
      assert(out.select($"eid", $"pid").as[(Long, Long)]
        .collect().toSeq.sorted == expected)
    }
  }

  test("timestamp-typed BETWEEN joins are rewritten (epoch-second cells)") {
    val evts = Seq((1L, "2024-01-01 00:00:30"), (2L, "2024-01-01 01:30:00"))
      .toDF("eid", "t").select($"eid", to_timestamp($"t").as("t"))
    val spans = Seq((10L, "2024-01-01 00:00:00", "2024-01-01 00:59:59"),
      (11L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"))
      .toDF("sid", "lo", "hi")
      .select($"sid", to_timestamp($"lo").as("lo"), to_timestamp($"hi").as("hi"))
    val cond = $"t" >= $"lo" && $"t" <= $"hi"
    val expected = evts.join(spans, cond)
      .select($"eid", $"sid").as[(Long, Long)].collect().toSeq.sorted
    withRule(3600) { // 1-hour cells
      val out = evts.join(spans, cond)
      assert(out.queryExecution.optimizedPlan.toString.contains("__graft_cell"))
      assert(out.select($"eid", $"sid").as[(Long, Long)]
        .collect().toSeq.sorted == expected)
    }
  }

  test("a column-vs-literal equality filter does not suppress the rewrite") {
    val cond = $"d" >= $"lo" && $"d" <= $"hi" && $"iid" === 11L
    val expected = points.join(intervals, cond)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(32) {
      val out = points.join(intervals, cond)
      assert(out.queryExecution.optimizedPlan.toString.contains("__graft_cell"),
        "literal equality is a filter, not an equi-join key")
      assert(out.select($"pid", $"iid").as[(Long, Long)]
        .collect().toSeq.sorted == expected)
    }
  }

  test("malformed width conf degrades to a no-op instead of failing queries") {
    RangeJoinRuleInstaller.install(spark)
    spark.conf.set(RangeJoinRule.WidthConf, "64m")
    try {
      val out = points.join(intervals, $"d" >= $"lo" && $"d" <= $"hi")
      assert(out.count() == 6) // still answers; rewrite simply off
    } finally spark.conf.set(RangeJoinRule.WidthConf, "0")
  }

  test("joins with an equi-key are left untouched") {
    withRule(32) {
      val out = points.join(intervals, $"pid" === $"iid" && $"d" >= $"lo")
      val plan = out.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_cell"), plan.take(1200))
    }
  }

  test("rule is a no-op when the width conf is unset") {
    RangeJoinRuleInstaller.install(spark)
    val out = points.join(intervals, $"d" >= $"lo" && $"d" <= $"hi")
    assert(!out.queryExecution.optimizedPlan.toString.contains("__graft_cell"))
  }
}
