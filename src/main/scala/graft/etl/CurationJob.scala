package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Curation}

/** The training-data counterpart of [[GraftEtl]]: an end-to-end corpus
  * curation job composing the library's operators into the deliverable
  * a data-pipeline user actually runs —
  *
  *   read corpus → rule-based quality filter → exact-dup keeper →
  *   context-window chunking → token-budget packing → partitioned
  *   parquet (chunks partitioned by lang for downstream pruning).
  *
  * Everything in the chain is a gated operator (q_quality_rules,
  * q_dedup_exact, q_chunk_docs, q_pack_sequences); this class only
  * composes and stores. Scale shape: one window shuffle for the dedup
  * keeper, one for packing; chunking stays narrow; the write is
  * partitioned by the pruning column.
  */
class CurationJob(spark: SparkSession, inputPath: String,
                  outputPath: String,
                  window: Int = 32, stride: Int = 24, budget: Int = 512) {

  def corpus(): DataFrame = spark.read.parquet(inputPath)

  /** Quality-kept, exact-dup-deduplicated documents. */
  def curated(): DataFrame = {
    val kept = Curation.qualityRules(corpus(), "text").filter(col("keep"))
    kept.withColumn("__keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("text"))))
      .filter(col("doc_id") === col("__keep_id"))
      .drop("__keep_id")
  }

  /** Run the full job; returns a one-row summary frame (also written,
    * so the job run is auditable). */
  def run(): DataFrame = {
    val docs = curated().cache()
    try {
      val chunks = Chunking.chunk(docs, "doc_id", "text", window, stride)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      val bins = Chunking.packSequences(
        docs.withColumn("n_tokens", size(split(col("text"), " ")).cast("long")),
        "doc_id", "n_tokens", "lang", budget)
      chunks.write.mode("overwrite").partitionBy("lang")
        .parquet(s"$outputPath/chunks")
      bins.write.mode("overwrite").parquet(s"$outputPath/bins")
      val summary = corpus().agg(count(lit(1)).as("n_docs_in"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs_kept")))
        .crossJoin(spark.read.parquet(s"$outputPath/chunks")
          .agg(count(lit(1)).as("n_chunks")))
        .crossJoin(spark.read.parquet(s"$outputPath/bins")
          .agg((max(col("bin")) + 1).as("n_bins_max_stratum")))
      summary.write.mode("overwrite").parquet(s"$outputPath/summary")
      spark.read.parquet(s"$outputPath/summary")
    } finally docs.unpersist()
  }
}
