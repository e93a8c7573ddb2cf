package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Curation, Dedup}

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
  def curated(): DataFrame =
    Dedup.keepFirst(
      Curation.qualityRules(corpus(), "text").filter(col("keep")),
      Seq("text"), "doc_id")

  /** Run the full job; returns a one-row summary frame (also written,
    * so the job run is auditable). */
  def run(): DataFrame = {
    val docs = curated().cache()
    try {
      // lang rides the narrow chunk explode as a carry column — a join
      // against the corpus here would shuffle the whole chunk fan-out
      val chunks = Chunking.chunk(docs, "doc_id", "text", window, stride,
        carryCols = Seq("lang"))
      // n_words is already materialized by qualityRules on this cached
      // frame — ONE tokenization definition for rules and packing alike
      val bins = Chunking.packSequences(
        docs.withColumn("n_tokens", col("n_words").cast("long")),
        "doc_id", "n_tokens", "lang", budget)
      chunks.write.mode("overwrite").partitionBy("lang")
        .parquet(s"$outputPath/chunks")
      bins.write.mode("overwrite").parquet(s"$outputPath/bins")
      val summary = corpus().agg(count(lit(1)).as("n_docs_in"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs_kept")))
        .crossJoin(spark.read.parquet(s"$outputPath/chunks")
          .agg(count(lit(1)).as("n_chunks")))
        .crossJoin(spark.read.parquet(s"$outputPath/bins")
          .agg(coalesce(max(col("bin")) + 1, lit(0L))
            .as("n_bins_max_stratum")))
      summary.write.mode("overwrite").parquet(s"$outputPath/summary")
      spark.read.parquet(s"$outputPath/summary")
    } finally docs.unpersist()
  }
}

/** CLI for the curation job (the GraftEtlMain shape applied to the
  * training-data tier): `-i` corpus parquet, `-o` output root, with
  * optional window/stride/budget overrides. */
object CurationJobMain {

  val Usage =
    "Usage: CurationJobMain -i <inputPath> -o <outputPath> " +
      "[-w <window>] [-s <stride>] [-b <budget>]"

  case class Args(input: String = "", output: String = "",
                  window: Int = 32, stride: Int = 24, budget: Int = 512)

  private val Flags = Set("-i", "-o", "-w", "-s", "-b")

  @annotation.tailrec
  def parseArgs(args: List[String], acc: Args = Args()): Args = args match {
    case Nil =>
      require(acc.input.nonEmpty && acc.output.nonEmpty, Usage)
      acc
    case "-i" :: v :: rest => parseArgs(rest, acc.copy(input = v))
    case "-o" :: v :: rest => parseArgs(rest, acc.copy(output = v))
    case "-w" :: v :: rest => parseArgs(rest, acc.copy(window = v.toInt))
    case "-s" :: v :: rest => parseArgs(rest, acc.copy(stride = v.toInt))
    case "-b" :: v :: rest => parseArgs(rest, acc.copy(budget = v.toInt))
    case flag :: Nil if Flags(flag) =>
      throw new IllegalArgumentException(s"missing value for '$flag'. $Usage")
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown option '$other'. $Usage")
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args.toList)
    val spark = SparkSession.builder()
      .appName("GraftCuration")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val summary =
      new CurationJob(spark, a.input, a.output, a.window, a.stride, a.budget)
        .run()
    summary.show(truncate = false)
  }
}
