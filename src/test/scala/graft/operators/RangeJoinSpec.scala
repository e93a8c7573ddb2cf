package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 31L), (3L, 32L), (4L, 100L))
    .toDF("pid", "d")
  // intervals crossing bucket boundaries (width 32), touching bounds,
  // empty-width, and non-matching
  private val intervals = Seq(
    (10L, 0L, 5L),     // matches p=5 at its hi bound
    (11L, 5L, 40L),    // spans buckets 0 and 1: matches 5, 31, 32
    (12L, 32L, 32L),   // width 0: matches exactly p=32
    (13L, 33L, 99L),   // matches nothing (100 just outside)
    (14L, 100L, 200L)  // matches p=100 at its lo bound
  ).toDF("iid", "lo", "hi")

  test("pointInInterval == naive theta join (each pair exactly once)") {
    val bucketed = RangeJoin.pointInInterval(points, intervals,
        "d", "lo", "hi", bucketWidth = 32)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    val naive = points.crossJoin(intervals)
      .filter($"d" >= $"lo" && $"d" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(bucketed.sorted == naive.sorted) // Seq compare: no dup pairs
    assert(bucketed.toSet == Set((1L, 10L), (1L, 11L), (2L, 11L),
      (3L, 11L), (3L, 12L), (4L, 14L)))
  }

  test("bucketed plan joins on an equi-key (no nested-loop join)") {
    val plan = RangeJoin.pointInInterval(points, intervals,
      "d", "lo", "hi", bucketWidth = 32).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1000))
  }

  test("property: random points x intervals == naive theta join, several widths") {
    val rnd = new scala.util.Random(7)
    val ps = (1 to 150).map(i => (i.toLong, rnd.nextLong(2000) - 500)).toDF("pid", "d")
    val ivs = (1 to 150).map { i =>
      val lo = rnd.nextLong(2000) - 500
      (i.toLong, lo, lo + rnd.nextLong(90))
    }.toDF("iid", "lo", "hi")
    val naive = ps.crossJoin(ivs).filter($"d" >= $"lo" && $"d" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    for (w <- Seq(1L, 13L, 64L, 5000L)) {
      val out = RangeJoin.pointInInterval(ps, ivs, "d", "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
      assert(out == naive, s"width=$w")
    }
  }

  test("width 1 and huge width both stay correct") {
    for (w <- Seq(1L, 1000000L)) {
      val out = RangeJoin.pointInInterval(points, intervals,
          "d", "lo", "hi", bucketWidth = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
      assert(out.sorted == out.toSet.toSeq.sorted && out.size == 6, s"w=$w")
    }
  }

  test("property: intervalOverlap == naive theta join, exactly once per pair") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextLong(1500) - 400
      (i.toLong, lo, lo + rnd.nextLong(80))
    }.toDF(s"id_$tag", s"lo_$tag", s"hi_$tag")
    val l = mk(120, "a"); val r = mk(120, "b")
    val naive = l.crossJoin(r)
      .filter($"lo_a" <= $"hi_b" && $"lo_b" <= $"hi_a")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted
    for (w <- Seq(1L, 17L, 64L, 100000L)) {
      val out = RangeJoin.intervalOverlap(l, r, "lo_a", "hi_a", "lo_b",
          "hi_b", bucketWidth = w)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted
      assert(out == naive, s"width=$w (dups or misses)")
    }
  }

  test("intervalOverlap honors extra equi-keys and plans no nested loop") {
    val l = Seq((1L, "x", 0L, 10L), (2L, "y", 0L, 10L))
      .toDF("id_a", "grp", "lo_a", "hi_a")
    val r = Seq((7L, "x", 5L, 6L), (8L, "y", 40L, 50L))
      .toDF("id_b", "grp", "lo_b", "hi_b")
    val df = RangeJoin.intervalOverlap(l, r, "lo_a", "hi_a", "lo_b",
      "hi_b", bucketWidth = 8, extraKeys = Seq("grp"))
    assert(df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      == Set((1L, 7L))) // (2,y) overlaps nothing; (1,x)x(8,y) cross-group
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1000))
  }

  test("intervalOverlap: touching endpoints count, disjoint do not") {
    val l = Seq((1L, 0L, 10L)).toDF("id_a", "lo_a", "hi_a")
    val r = Seq((1L, 10L, 20L), (2L, 11L, 20L)).toDF("id_b", "lo_b", "hi_b")
    val out = RangeJoin.intervalOverlap(l, r, "lo_a", "hi_a", "lo_b",
        "hi_b", bucketWidth = 4)
      .select($"id_b").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
