package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("priorMarker: strictly-prior most recent marker per key") {
    val df = Seq(
      ("u1", 1L, "signup"), ("u1", 5L, "purchase"), ("u1", 7L, "signup"),
      ("u1", 9L, "purchase"), ("u2", 2L, "purchase")
    ).toDF("k", "t", "typ")
    val out = AsOf.priorMarker(df, "k", "t",
        when($"typ" === "signup", $"t"), "prior_signup")
      .filter($"typ" === "purchase")
      .select($"k", $"t", $"prior_signup")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(("u1", 5L, 1L), ("u1", 9L, 7L), ("u2", 2L, -1L)))
  }

  test("asofJoin: backward join, ties go to right row, missing -> null") {
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0))
      .toDF("sym", "t", "px")
    val trades = Seq(("A", 0L, 100), ("A", 5L, 200), ("A", 6L, 300),
      ("B", 9L, 400)).toDF("sym", "t", "qty")
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", Seq("px"))
      .select($"sym", $"t", $"qty", $"px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(out == Set(
      ("A", 0L, 100, -1.0),   // no quote yet
      ("A", 5L, 200, 11.0),   // tie: quote at t=5 applies
      ("A", 6L, 300, 11.0),
      ("B", 9L, 400, 20.0)))
  }
}
