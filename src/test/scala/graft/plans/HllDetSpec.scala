package graft.plans

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Deterministic mergeable HLL: the invariants that make the sketch
  * tier gateable (q_sketch_merge / q_sketch_distinct_bound).
  */
class HllDetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.Tables.events(spark, sfDir)

  test("merge of partials == one-shot estimate, EXACTLY, for any split") {
    // split 1: per-day partials merged up to event_type
    val byDay = events.withColumn("day", expr("ts_ns DIV 86400000000000"))
    val mergedDay = Sketches.detMerge(
        Sketches.detPartial(byDay, Seq("event_type", "day"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    // split 2: arbitrary 13-way salt split (different partials entirely)
    val salted = events.withColumn("salt", pmod(col("event_id"), lit(13)))
    val mergedSalt = Sketches.detMerge(
        Sketches.detPartial(salted, Seq("event_type", "salt"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    val oneshot = Sketches.detDistinct(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    assert(mergedDay == oneshot,
      s"per-day merge must equal one-shot: $mergedDay vs $oneshot")
    assert(mergedSalt == oneshot,
      s"salt-split merge must equal one-shot: $mergedSalt vs $oneshot")
  }

  test("estimate within the lgK=12 error bound of the exact count") {
    val est = Sketches.detDistinct(events, Seq("event_type"), "user_id")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, "event_type").collect().foreach { r =>
      val (e, x) = (r.getAs[Long]("approx_distinct"), r.getAs[Long]("n_exact"))
      // 3 sigma at 1.04/sqrt(4096) ~ 5%; +5 absolute floor for tiny groups
      assert(math.abs(e - x) <= x * 0.05 + 5, s"${r.getString(0)}: est=$e exact=$x")
    }
  }

  test("small cardinalities are near-exact via linear counting") {
    val n = 200
    val est = (1 to n).toDF("v").select(col("v").cast("long").as("v"))
      .withColumn("g", lit(1))
    val got = Sketches.detDistinct(est, Seq("g"), "v")
      .head().getAs[Long]("approx_distinct")
    // linear counting at n=200, m=4096: std error ~ sqrt(m*(e^t-1-t))/t/... a
    // few counts; 5% covers >3 sigma
    assert(math.abs(got - n) <= n * 0.05, s"linear-counting range: est=$got exact=$n")
  }

  test("register update/merge unit semantics") {
    val a = new Array[Byte](HllDet.M)
    val b = new Array[Byte](HllDet.M)
    val all = new Array[Byte](HllDet.M)
    (1L to 500L).foreach { v =>
      if (v % 2 == 0) HllDet.update(a, v) else HllDet.update(b, v)
      HllDet.update(all, v)
    }
    HllDet.mergeInto(a, b)
    assert(a.sameElements(all), "merge of disjoint halves == update-all registers")
    assert(HllDet.estimate(a) == HllDet.estimate(all))
    // idempotent re-merge
    HllDet.mergeInto(a, all)
    assert(a.sameElements(all))
  }
}
