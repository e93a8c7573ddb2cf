package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalIngestSpec extends SparkSpec {

  private def work() = java.nio.file.Files
    .createTempDirectory("incr_spec").toAbsolutePath.toString

  private val docs = graft.Tables.load(spark, sfDir, "documents")

  private def drain(w: String): Unit =
    IncrementalIngest.drainToParquet(spark, s"$w/src", docs.schema,
      s"$w/out", s"$w/ckpt")(df =>
      df.select(col("doc_id"), col("n_chars")))

  test("two staged drains produce each row exactly once") {
    val w = work()
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val afterFirst = spark.read.parquet(s"$w/out").count()
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val out = spark.read.parquet(s"$w/out")
    assert(afterFirst == docs.filter(col("doc_id") % 2 === 0).count())
    assert(out.count() == docs.count())
    assert(out.groupBy("doc_id").count().filter(col("count") > 1)
      .count() == 0, "no row may be ingested twice")
  }

  test("re-draining with nothing new is a no-op") {
    val w = work()
    docs.coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val n1 = spark.read.parquet(s"$w/out").count()
    drain(w) // same checkpoint, no new files
    assert(spark.read.parquet(s"$w/out").count() == n1)
  }
}
