package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillForward: dense axis, carried values, gap flags") {
    val sparse = Seq(
      (1L, 10L, 100L), (1L, 13L, 130L),   // gaps at 11, 12
      (2L, 5L, 50L),                       // single bucket: no gaps
      (3L, 7L, 70L), (3L, 8L, 80L))        // contiguous: no gaps
      .toDF("k", "b", "v")
    val out = TimeSeries.gapFillForward(sparse, "k", "b", "v")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(out == Map(
      (1L, 10L) -> (100L, false), (1L, 11L) -> (100L, true),
      (1L, 12L) -> (100L, true), (1L, 13L) -> (130L, false),
      (2L, 5L) -> (50L, false),
      (3L, 7L) -> (70L, false), (3L, 8L) -> (80L, false)))
  }

  test("gapFillForward: row count is sum of per-key ranges") {
    val events = graft.Tables.load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    val hourly = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns DIV 1000 DIV 3600000000").as("h"))
      .groupBy("user_id", "h").count()
    val expected = hourly.groupBy("user_id")
      .agg((max("h") - min("h") + 1).as("n"))
      .agg(sum("n")).as[Long].head()
    val got = TimeSeries.gapFillForward(
      hourly.withColumnRenamed("count", "v"), "user_id", "h", "v").count()
    assert(got == expected)
  }

  test("twap: duration-weighted mean, exact vs hand computation") {
    // key 1: value 10 held for 4 ticks, 30 held for 1, last sample
    // (99 at t=5) carries no weight -> twap = (10*4 + 30*1) DIV 5 = 14
    val df = Seq(
      (1L, 0L, 1L, 10L), (1L, 4L, 2L, 30L), (1L, 5L, 3L, 99L),
      (2L, 7L, 4L, 50L))                  // single sample: no row
      .toDF("k", "ts", "eid", "v")
    val rows = TimeSeries.twap(df, "k", "ts", "v", Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, 14L, 5L)))
  }

  test("twap: tied timestamps are deterministic (zero-duration ties)") {
    val df = Seq(
      (1L, 0L, 1L, 100L), (1L, 10L, 2L, 200L), (1L, 10L, 3L, 999L),
      (1L, 20L, 4L, 0L))
      .toDF("k", "ts", "eid", "v")
    // eid order: 100 held 10, 200 held 0 (tie), 999 held 10, 0 last
    val rows = TimeSeries.twap(df, "k", "ts", "v", Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, (100L * 10 + 999L * 10) / 20, 20L)))
  }
}
