package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.{QueriesML, Tables}

/** Interleaved decomposition of the LSH→verify near-dup query: times
  * candidate generation, verification-over-materialized-pairs, and the
  * fused query in one JVM to locate the cost (run-to-run box noise is
  * +-40%; in-JVM interleaving is the only trustworthy comparison).
  * Usage: runMain graft.tools.AbJaccard <sfDir>
  */
object AbJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[abjaccard] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    def cands: DataFrame = Dedup.minhashCandidates(docs, "doc_id", "text",
      QueriesML.ShingleN, QueriesML.MinhashK, QueriesML.MinhashBands)

    // warm-up
    cands.count(); QueriesML.ngramJaccard(spark, sfDir).count()

    val pinned = cands.localCheckpoint()
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
      QueriesML.ShingleN, QueriesML.MinhashK)
    val bands = Dedup.lshBands(sigs, "doc_id", QueriesML.MinhashK,
      QueriesML.MinhashBands)
    val buckets = bands.groupBy(col("band"), col("band_key"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val expanded = buckets
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val pinnedSigs = sigs.localCheckpoint()
    val bucketsFromPinned = Dedup.lshBands(pinnedSigs, "doc_id",
        QueriesML.MinhashK, QueriesML.MinhashBands)
      .groupBy(col("band"), col("band_key"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
    for (round <- 1 to 3) {
      time(s"r$round signatures-only")(sigs.count())
      time(s"r$round bands")(bands.count())
      time(s"r$round buckets-from-pinned-sigs")(bucketsFromPinned.count())
      time(s"r$round buckets")(buckets.count())
      time(s"r$round expanded-nodistinct")(expanded.count())
      time(s"r$round candidates")(cands.count())
      time(s"r$round verify-on-pinned")(
        Dedup.jaccardVerifyPairs(pinned, docs, "doc_id", "text",
          QueriesML.JaccardW, QueriesML.JaccardThreshold).count())
      time(s"r$round fused-query")(QueriesML.ngramJaccard(spark, sfDir).count())
    }
    spark.stop()
  }
}
