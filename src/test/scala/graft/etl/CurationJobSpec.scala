package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationJobSpec extends SparkSpec {

  test("curation job: filter -> dedup -> chunk -> pack -> partitioned store") {
    val out = Files.createTempDirectory("graft_curation_job").toString
    val job = new CurationJob(spark, s"$sfDir/documents.parquet", out)
    val summary = job.run().head()

    val nIn = summary.getAs[Long]("n_docs_in")
    val nKept = summary.getAs[Long]("n_docs_kept")
    assert(nIn == spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(nKept > 0 && nKept < nIn) // rules + dedup actually drop docs

    // chunks: partitioned by lang, exactly the kept docs, none empty
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(new java.io.File(s"$out/chunks").listFiles()
      .exists(_.getName.startsWith("lang=")))
    val curatedIds = job.curated().select("doc_id").collect().map(_.getLong(0)).toSet
    val chunkIds = chunks.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(chunkIds == curatedIds)
    assert(chunks.filter(col("n_chunk_words") <= 0).count() == 0)

    // bins: every kept doc assigned, offsets consistent with bin DIV
    val bins = spark.read.parquet(s"$out/bins")
    assert(bins.count() == nKept)
    assert(bins.filter(col("bin") =!= expr("start_offset DIV 512")).count() == 0)
  }

  test("CLI arg parse: required/optional/unknown") {
    val a = CurationJobMain.parseArgs(
      List("-i", "/in", "-o", "/out", "-b", "1024"))
    assert(a == CurationJobMain.Args("/in", "/out", 32, 24, 1024))
    intercept[IllegalArgumentException] {
      CurationJobMain.parseArgs(List("-x", "nope"))
    }
    intercept[IllegalArgumentException] {
      CurationJobMain.parseArgs(List("-i", "/in")) // missing -o
    }
  }
}
