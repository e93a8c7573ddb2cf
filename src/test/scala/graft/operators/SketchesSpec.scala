package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.Tables.events(spark, sfDir)

  test("approx distinct within the configured error of the exact count") {
    val exact = events.select("user_id").distinct().count()
    val approx = Sketches.approxDistinct(
        events.withColumn("g", lit(1)), Seq("g"), "user_id", rsd = 0.05)
      .head().getAs[Long]("approx_distinct")
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx=$approx exact=$exact") // 3x rsd headroom
  }

  test("HLL partial sketches merge to the same estimate as one global sketch") {
    // partial per event_type, merged across all types
    val partials = Sketches.hllPartial(events, Seq("event_type"), "user_id")
      .withColumn("g", lit(1))
    val merged = Sketches.hllMerge(partials, Seq("g"))
      .head().getAs[Long]("approx_distinct")
    val global = events.withColumn("g", lit(1))
      .groupBy("g").agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .head().getAs[Long]("e")
    assert(merged == global,
      s"merge-of-partials ($merged) must equal the one-shot sketch ($global)")
    val exact = events.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact <= 0.1,
      s"merged=$merged exact=$exact")
  }

  test("count-min: never underestimates; merge == one-shot by cell sums") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val words = Seq.fill(5000)(s"w${(1.0 / (rnd.nextDouble() + 0.01)).toInt}")
    val df = words.toDF("w")
    val cells = Sketches.countMinCells(df, "w", 3, 64)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probe = exact.keys.toSeq.toDF("w")
    val est = Sketches.countMinEstimate(cells, probe, "w", 3, 64)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w: est ${est(w)} < exact $n")
    }
    // mergeability: cell tables of two halves sum to the full table
    val (h1, h2) = words.splitAt(words.size / 2)
    val mergedCells = Sketches.countMinCells(h1.toDF("w"), "w", 3, 64)
      .union(Sketches.countMinCells(h2.toDF("w"), "w", 3, 64))
      .groupBy("r", "cell").agg(sum("n").as("n"))
    val full = cells.as[(Int, Long, Long)].collect().toSet
    assert(mergedCells.as[(Int, Long, Long)].collect().toSet == full)
  }

  test("approx quantiles bracket the exact quantiles") {
    val cents = events.select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val approx = Sketches.approxQuantiles(cents, Seq("event_type"), "cents",
        Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exactQ = cents.groupBy("event_type")
      .agg(expr("percentile(cents, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((et, qs) <- approx; (a, e) <- qs.zip(exactQ(et))) {
      val spread = exactQ(et).last - exactQ(et).head
      assert(math.abs(a - e) <= math.max(spread * 0.05, 1.0),
        s"$et: approx=$a exact=$e")
    }
  }

  // --- Bloom filter ------------------------------------------------------

  test("bloom: no false negatives, merged batches == one-shot build") {
    import spark.implicits._
    val keys = (1 to 400).map(i => s"k$i").toDF("key")
    val one = Sketches.bloomBuild(keys, col("key"), bitsLog2 = 12, k = 4)
    // split into two batches, build separately, merge by bit_or
    val a = Sketches.bloomBuild(
      keys.filter(expr("substring(key, 2) % 2 = 0")), col("key"), 12, 4)
    val b = Sketches.bloomBuild(
      keys.filter(expr("substring(key, 2) % 2 = 1")), col("key"), 12, 4)
    val merged = a.union(b).groupBy("word_idx")
      .agg(expr("bit_or(bits)").as("bits"))
    assert(merged.as[(Long, Long)].collect().toMap ==
      one.as[(Long, Long)].collect().toMap)
    // every built key probes true
    val probed = Sketches.bloomProbe(one, keys, "key", 12, 4)
    assert(probed.filter(!col("member")).count() == 0)
  }

  test("bloom: unseen keys mostly reject; fp rate within 4x formula bound") {
    import spark.implicits._
    val built = (1 to 400).map(i => s"k$i").toDF("key")
    val words = Sketches.bloomBuild(built, col("key"), bitsLog2 = 12, k = 4)
    val unseen = (1 to 1000).map(i => s"other$i").toDF("key")
    val fp = Sketches.bloomProbe(words, unseen, "key", 12, 4)
      .filter(col("member")).count()
    // (1 - e^{-kn/m})^k with k=4, n=400, m=4096 -> ~0.7% expected
    val bound = math.pow(1 - math.exp(-4.0 * 400 / 4096), 4)
    assert(fp <= math.max(1000 * bound * 4, 25.0), s"fp=$fp")
  }
}
