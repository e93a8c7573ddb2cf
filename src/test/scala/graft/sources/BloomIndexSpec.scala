package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-file Bloom index: equality file-skipping on a column the
  * layout is NOT clustered by. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  // 10 files clustered by `d`; lookups probe `k`, which each file
  // holds an arbitrary slice of (k = i*7 % 1000 scatters keys
  // across d-ranges, but each key lives in exactly ONE file)
  private lazy val dir: String = {
    val d = Files.createTempDirectory("bloomidx").toString + "/t"
    (0L until 1000L).map(i => (i, i * 7 % 1000, s"r$i"))
      .toDF("d", "k", "payload")
      .repartitionByRange(10, col("d"))
      .write.parquet(d)
    d
  }
  private lazy val bloom =
    FileSkipping.collectBloomStats(spark, dir, "k", bitsLog2 = 12)

  private def trueFiles(k: Long): Set[String] =
    spark.read.parquet(dir).filter(col("k") === k)
      .select(input_file_name()).as[String].collect().toSet

  test("zero false negatives: candidates always cover the true files") {
    (0L until 1000L by 97L).foreach { k =>
      val cands = FileSkipping
        .candidateFilesBloom(spark, bloom, k, bitsLog2 = 12).toSet
      assert(trueFiles(k).subsetOf(cands),
        s"key $k: true files not all candidates")
    }
  }

  test("pruned equality read == full scan + filter, and actually prunes") {
    var totalCands = 0
    (0L until 1000L by 83L).foreach { k =>
      val cands = FileSkipping
        .candidateFilesBloom(spark, bloom, k, bitsLog2 = 12)
      totalCands += cands.size
      val got = FileSkipping
        .prunedReadEquality(spark, dir, bloom, "k", k, bitsLog2 = 12)
        .select("d", "k", "payload").as[(Long, Long, String)]
        .collect().toSet
      val want = spark.read.parquet(dir).filter(col("k") === k)
        .select("d", "k", "payload").as[(Long, Long, String)]
        .collect().toSet
      assert(got == want)
    }
    // each key lives in 1 file; with 4096 bits / ~100 keys per file
    // the FP rate is well under 1 extra file per lookup on average
    assert(totalCands < 13 * 2,
      s"index failed to prune: $totalCands candidate files for 13 lookups")
  }

  test("a key absent from the table reads back zero rows") {
    val got = FileSkipping
      .prunedReadEquality(spark, dir, bloom, "k", 999999L, bitsLog2 = 12)
    assert(got.count() == 0L)
    // schema intact even when no candidate file survives
    assert(got.columns.toSeq == Seq("d", "k", "payload"))
  }
}
