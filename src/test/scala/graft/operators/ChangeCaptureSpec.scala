package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  private val changes = Seq(
    // (user, ts, event_id, op, payload)
    (1L, 10L, 100L, "upsert", "a"),
    (1L, 20L, 101L, "upsert", "b"),   // latest for user 1
    (2L, 10L, 102L, "upsert", "c"),
    (2L, 30L, 103L, "delete", ""),    // user 2 deleted
    (3L, 10L, 104L, "delete", ""),
    (3L, 20L, 105L, "upsert", "d"),   // re-created after delete
    (4L, 10L, 106L, "upsert", "e"),
    (4L, 10L, 107L, "upsert", "f")    // same ts: event_id breaks the tie
  ).toDF("user_id", "ts", "event_id", "op", "payload")

  test("applyLatest: latest row wins, deletes drop the key, ties broken") {
    val state = ChangeCapture.applyLatest(changes, Seq("user_id"),
        Seq("ts", "event_id"), col("op") === "delete")
      .select("user_id", "event_id", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(state == Set((1L, 101L, "b"), (3L, 105L, "d"), (4L, 107L, "f")))
  }

  test("applyLatest: base+delta merge equals one-shot apply (incremental soundness)") {
    val base = changes.filter(col("ts") <= 10)
    val delta = changes.filter(col("ts") > 10)
    // state(base) re-enters the merge as upserts at its original order keys
    val baseState = ChangeCapture.applyLatest(base, Seq("user_id"),
      Seq("ts", "event_id"), col("op") === "delete")
    val twoStep = ChangeCapture.applyLatest(baseState.unionByName(delta),
        Seq("user_id"), Seq("ts", "event_id"), col("op") === "delete")
      .select("user_id", "event_id", "payload")
      .as[(Long, Long, String)].collect().toSet
    val oneShot = ChangeCapture.applyLatest(changes, Seq("user_id"),
        Seq("ts", "event_id"), col("op") === "delete")
      .select("user_id", "event_id", "payload")
      .as[(Long, Long, String)].collect().toSet
    // NOTE this equality needs deletes that are TOMBSTONES within the
    // delta window; user 3's delete-then-recreate both sit in base here
    assert(twoStep == oneShot)
  }

  test("scd2: consecutive duplicates collapse, intervals chain, current open") {
    val hist = Seq(
      (1L, "new", 10L, 100L),
      (1L, "new", 20L, 101L),     // collapsed (no change)
      (1L, "active", 30L, 102L),
      (1L, "churned", 40L, 103L),
      (2L, "new", 10L, 104L)
    ).toDF("user_id", "state", "ts", "event_id")
    val out = ChangeCapture.scd2(hist, "user_id", "state", "ts", "event_id")
      .select("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
      .as[(Long, String, Long, Option[Long], Int, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "new", 10L, Some(30L), 1, false),
      (1L, "active", 30L, Some(40L), 2, false),
      (1L, "churned", 40L, None, 3, true),
      (2L, "new", 10L, None, 1, true)))
  }

  test("scd2: intervals tile the key's timeline (valid_to == next valid_from)") {
    val e = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
    val hist = ChangeCapture.scd2(e, "user_id", "event_type", "ts_us",
      "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from"))
    val broken = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(
        (col("next_from").isNotNull && col("valid_to") =!= col("next_from")) ||
        (col("next_from").isNull && !col("is_current")))
    assert(broken.count() == 0)
    // exactly one current row per user
    val users = e.select("user_id").distinct().count()
    assert(hist.filter(col("is_current")).count() == users)
  }

  test("point-in-time lookup via scd2 + asof: boundary probes hit the opening version") {
    import spark.implicits._
    // user 1: A at t=10, B at t=30, C at t=50
    val hist = Seq((1L, "A", 10L, 1L), (1L, "B", 30L, 2L), (1L, "C", 50L, 3L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val scd = ChangeCapture.scd2(hist, "user_id", "event_type", "ts_us",
        "event_id")
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from"), col("version"),
        col("valid_from").as("ts_us"))
    val probes = Seq((1L, 10L, 100L), (1L, 29L, 101L), (1L, 30L, 102L),
      (1L, 49L, 103L), (1L, 99L, 104L))
      .toDF("user_id", "ts_us", "event_id")
    val out = AsOf.asofJoinNative(probes, scd, "user_id", "ts_us",
        Seq("state", "valid_from", "version"))
      .select("event_id", "state").as[(Long, String)].collect().toMap
    assert(out == Map(100L -> "A", 101L -> "A", 102L -> "B",
      103L -> "B", 104L -> "C"))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged omitted") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, 100L, "A"), (2L, 200L, "B"), (3L, 300L, "C"), (4L, 400L, "D"))
      .toDF("k", "v", "s")
    val newSnap = Seq(
      (1L, 100L, "A"),          // unchanged -> omitted
      (2L, 250L, "B"),          // value changed
      (3L, 300L, "X"),          // attr changed
      (5L, 500L, "E"))          // added; 4 removed
      .toDF("k", "v", "s")
    val out = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"),
        Seq("v", "s"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("snapshotDiff: null-safe comparison treats null==null as unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, Option.empty[Long]), (2L, Some(5L)))
      .toDF("k", "v")
    val newSnap = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "v")
    val out = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed"))
  }

  test("rangeDigest: row-order and partitioning invariant; equal tables diff empty") {
    import spark.implicits._
    val rows = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val a = ChangeCapture.rangeDigest(rows.repartition(7), "k", 16L, Seq("v"))
    val b = ChangeCapture.rangeDigest(
      rows.orderBy(col("k").desc).repartition(2), "k", 16L, Seq("v"))
    assert(a.as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap == b.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap)
    assert(ChangeCapture.digestDiff(a, b).count() == 0)
  }

  test("digestDiff: a single changed/added/removed row flips exactly its bucket") {
    import spark.implicits._
    val old = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val neu = old.filter(col("k") =!= 40L)                    // removed in b2
      .withColumn("v", when(col("k") === 100L, lit("CHANGED")) // changed in b6
        .otherwise(col("v")))
      .union(Seq((300L, "new")).toDF("k", "v"))                // added in b18
    val diff = ChangeCapture.digestDiff(
        ChangeCapture.rangeDigest(old, "k", 16L, Seq("v")),
        ChangeCapture.rangeDigest(neu, "k", 16L, Seq("v")))
      .select("bucket", "status").as[(Long, String)].collect().toMap
    assert(diff == Map(2L -> "changed", 6L -> "changed", 18L -> "added"))
  }
}
