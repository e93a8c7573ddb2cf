package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-level data skipping: pruning must be an OPTIMIZATION (results
  * identical to full scan + filter for every range) and must actually
  * SKIP (value-clustered layout → narrow range touches few files). */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("prunedRead == full filter for every range; narrow ranges skip files") {
    val dir = Files.createTempDirectory("fskip").toString + "/t"
    val rnd = new scala.util.Random(13)
    val df = (1 to 5000).map(_ => (rnd.nextLong(100000), rnd.nextInt(100)))
      .toDF("k", "v")
    df.repartitionByRange(10, col("k")).write.parquet(dir)
    val stats = FileSkipping.collectStats(spark, dir, Seq("k"))
    val total = stats.count()
    assert(total == 10L)
    val full = spark.read.parquet(dir)
    for ((lo, hi) <- Seq((0L, 100000L), (40000L, 50000L), (99999L, 99999L),
      (-5L, -1L), (0L, 9L))) {
      val pruned = FileSkipping.prunedRead(spark, dir, stats, "k", lo, hi)
        .as[(Long, Int)].collect().sorted.toSeq
      val expect = full.filter(col("k") >= lo && col("k") <= hi)
        .as[(Long, Int)].collect().sorted.toSeq
      assert(pruned == expect, s"range [$lo, $hi]")
    }
    // the ~10%-wide range must touch a small fraction of the 10
    // range-clustered files (boundary straddle allows 2)
    val narrow = FileSkipping.candidateFiles(stats, "k", 40000L, 50000L)
    assert(narrow.size <= 3, s"expected <= 3 files, got ${narrow.size}")
    assert(FileSkipping.candidateFiles(stats, "k", -5L, -1L).isEmpty)
  }

  test("z-order layout prunes BOTH dimensions; 1-D sort only prunes its own") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 8000).map(_ =>
      (rnd.nextLong(60000), rnd.nextLong(60000), rnd.nextInt(10)))
    val df = rows.toDF("x", "y", "v")
    val zdir = Files.createTempDirectory("fskip_z").toString + "/t"
    graft.operators.ScaleOps.zorderLayout(df, col("x"), col("y"), 16)
      .write.parquet(zdir)
    val xdir = Files.createTempDirectory("fskip_x").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(xdir)
    val zstats = FileSkipping.collectStats(spark, zdir, Seq("x", "y"))
    val xstats = FileSkipping.collectStats(spark, xdir, Seq("x", "y"))
    // a y-only band: the x-sorted layout cannot prune it at all
    val yBand = Seq(("y", 10000L, 20000L))
    val zY = FileSkipping.candidateFiles(zstats, yBand).size
    val xY = FileSkipping.candidateFiles(xstats, yBand).size
    assert(xY == 16, s"x-sorted layout must touch all files for a y band, got $xY")
    assert(zY < 16, s"z-order must prune a y band, got $zY/16")
    // a 2-D band prunes multiplicatively under z-order
    val band2 = Seq(("x", 10000L, 25000L), ("y", 10000L, 25000L))
    val z2 = FileSkipping.candidateFiles(zstats, band2).size
    assert(z2 <= zY, s"adding the x range must not widen the file set ($z2 vs $zY)")
    assert(z2 <= 8, s"2-D band should touch a minority of 16 z-files, got $z2")
    // and exactness on the 2-D read
    val got = FileSkipping.prunedRead(spark, zdir, zstats, band2)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val expect = spark.read.parquet(zdir)
      .filter(col("x").between(10000L, 25000L) &&
        col("y").between(10000L, 25000L))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("updateStats scans only new files yet equals a from-scratch collect") {
    val dir = Files.createTempDirectory("fskip_inc").toString + "/t"
    (1 to 1000).map(i => (i.toLong, i % 5)).toDF("k", "v")
      .repartition(4).write.parquet(dir)
    val s0 = FileSkipping.collectStats(spark, dir, Seq("k")).cache()
    assert(s0.count() == 4L)
    // append a commit's worth of new files
    (2000 to 2500).map(i => (i.toLong, i % 5)).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(dir)
    val s1 = FileSkipping.updateStats(spark, dir, s0, Seq("k"))
    val scratch = FileSkipping.collectStats(spark, dir, Seq("k"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0).replaceFirst("^file:/+", "/"),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(canon(s1) == canon(scratch))
    assert(s1.count() == 6L)
    // no new files -> the same frame comes back untouched
    assert(FileSkipping.updateStats(spark, dir, s1, Seq("k")).count() == 6L)
    // pruning through the incrementally-built stats is exact
    val got = FileSkipping.prunedRead(spark, dir, s1, "k", 2100L, 2200L)
      .as[(Long, Int)].collect().sorted.toSeq
    val expect = spark.read.parquet(dir)
      .filter(col("k").between(2100L, 2200L))
      .as[(Long, Int)].collect().sorted.toSeq
    assert(got == expect && got.nonEmpty)
    s0.unpersist()
  }

  test("all-null files are skippable; mixed-null files keep correct stats") {
    val dir = Files.createTempDirectory("fskip_null").toString + "/t"
    Seq[(java.lang.Long, String)]((null, "a"), (null, "b"))
      .toDF("k", "v").coalesce(1).write.parquet(dir)
    Seq[(java.lang.Long, String)]((5L, "c"), (null, "d"), (9L, "e"))
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    val stats = FileSkipping.collectStats(spark, dir, Seq("k"))
    assert(stats.count() == 2L)
    // the all-null file never matches a range predicate
    assert(FileSkipping.candidateFiles(stats, "k", 0L, 100L).size == 1)
    val got = FileSkipping.prunedRead(spark, dir, stats, "k", 0L, 100L)
      .select("v").as[String].collect().sorted.toSeq
    assert(got == Seq("c", "e"))
    // null accounting: 2 nulls in one file, 1 in the other
    val nulls = stats.select("k_nulls").as[Long].collect().sorted.toSeq
    assert(nulls == Seq(1L, 2L))
  }
}
