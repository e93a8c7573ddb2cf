package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchPairs(dir: String) =
    graft.operators.Dedup.minhashCandidates(
      graft.Tables.load(spark, dir, "documents"), "doc_id", "text", 5, 8, 4)

  test("streaming pairs == batch pairs (single batch)") {
    val st = NearDupStream.candidatePairs(spark, sfDir, "nds_one", 5, 8, 4)
    val bt = batchPairs(sfDir)
    assert(st.except(bt).count() == 0 && bt.except(st).count() == 0)
    assert(st.count() > 0, "fixture must produce at least one candidate")
  }

  test("bucket state carries across microbatches (one file per trigger)") {
    // split the corpus into 4 parquet files; maxFilesPerTrigger=1 forces
    // 4 microbatches, so most pairs span batches and exist ONLY if the
    // bucket membership survived in the state store
    val tmp = java.nio.file.Files
      .createTempDirectory("nds_split").toAbsolutePath.toString
    graft.Tables.load(spark, sfDir, "documents")
      .repartition(4).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val st = NearDupStream.candidatePairs(spark, tmp, "nds_multi", 5, 8, 4,
      maxFilesPerTrigger = Some(1))
    val bt = batchPairs(sfDir) // same rows, different file layout
    assert(st.except(bt).count() == 0 && bt.except(st).count() == 0)
  }

  test("RocksDB state store produces identical pairs (100 TB backend)") {
    // the default HDFS-backed provider keeps state on-heap; a corpus-
    // scale bucket index needs RocksDB. The operator must be backend-
    // agnostic: same pairs, bit for bit.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      val st = NearDupStream.candidatePairs(spark, sfDir, "nds_rocks",
        5, 8, 4)
      val bt = batchPairs(sfDir)
      assert(st.except(bt).count() == 0 && bt.except(st).count() == 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("hot-bucket overflow truncates state and stops emitting") {
    // 5 identical docs all land in the same buckets; cap 2 admits two
    // members per bucket -> exactly 1 pair, then the bucket overflows
    val tmp = java.nio.file.Files
      .createTempDirectory("nds_hot").toAbsolutePath.toString
    (1 to 5).map(i => (i.toLong, "same text body for every document here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val st = NearDupStream.candidatePairs(spark, tmp, "nds_hot", 5, 8, 4,
      maxBucketIds = 2)
    // only the bucket's first two arrivals pair up; which two ids they
    // are depends on arrival order, so assert the shape, not the ids
    val got = st.as[(Long, Long)].collect()
    assert(got.length == 1 && got.head._1 < got.head._2)
  }
}
