package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction reduces files, preserves the exact multiset, cleans up") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 2000).map(i => (i.toLong, s"row$i", i % 7)).toDF("k", "s", "m")
    df.repartition(32).write.parquet(dir)
    val before = spark.read.parquet(dir)
      .as[(Long, String, Int)].collect().sorted.toSeq
    val report = Compaction.compact(spark, dir, targetRowsPerFile = 500)
    assert(report.filesBefore == 32L)
    assert(report.filesAfter == 4L) // ceil(2000 / 500)
    assert(report.rows == 2000L)
    val after = spark.read.parquet(dir)
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(after == before)
    // staging/backup trees are gone — only the table remains
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("t"))
  }

  test("degenerate targets: fewer rows than target -> single file") {
    val dir = Files.createTempDirectory("compact1").toString + "/t"
    (1 to 10).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8).write.parquet(dir)
    val report = Compaction.compact(spark, dir, targetRowsPerFile = 1000000)
    assert(report.filesAfter == 1L && report.rows == 10L)
    assert(spark.read.parquet(dir).count() == 10L)
  }
}
