package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.CurationJob
import graft.operators.{Dedup, Similarity}
import graft.QueriesML

/** One-order-of-magnitude scale proof: replicate the sf0.1 corpus 10x
  * (~sf1) and run the LSH dedup path, the end-to-end curation job, and
  * the SRP-blocked embedding near-dup — the operators whose 100 TB
  * claims rest on candidate-bounded (not quadratic) work — recording
  * wall time, shuffle read/write bytes, and bucket-size extremes.
  *
  * Replication shape: each document gets `factor` near-identical
  * replicas (`text || ' r<i>'` — one trailing shingle differs), so the
  * scaled corpus is both 10x the rows AND 10x-denser in near-dup
  * structure: every replica family is a genuine near-dup cluster the
  * LSH path must surface and the cluster pass must collapse. That is
  * deliberately HARDER per-row than uniform fresh text (candidate
  * volume grows ~45 pairs/family), the honest stress for a dedup
  * engine whose workload at 100 TB is exactly "mostly-duplicated web
  * crawl". Embeddings replicate exactly (cos = 1 within a family) for
  * the same reason.
  *
  * Usage: runMain graft.tools.ScaleProof [sfDir] [factor] [workDir]
  */
object ScaleProof {
  private final class ShuffleMeter extends SparkListener {
    val write = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    val input = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_scaleproof")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions",
        "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // --- build the scaled corpus (not timed as a pipeline phase) ---
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nDocs0 = docs0.count()
    val idOffset = 10000000L
    docs0
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("doc_id") + col("r") * idOffset).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("r"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(64) // multi-file dataset: scan parallelism is real
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    emb0
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("vec_id") + col("r") * idOffset).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val docs = spark.read.parquet(s"$work/documents.parquet")
    val emb = spark.read.parquet(s"$work/embeddings.parquet")
    val nDocs = docs.count()
    val nVecs = emb.count()
    println(s"[scaleproof] corpus: $nDocs0 docs x$factor = $nDocs docs, " +
      s"$nVecs vectors, sfDir=$sfDir")

    val results = scala.collection.mutable.ArrayBuffer[String]()
    def phase(name: String)(body: => Long): Unit = {
      System.gc()
      val (w0, r0) = (meter.write.get(), meter.read.get())
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      val wMb = (meter.write.get() - w0) / 1e6
      val rMb = (meter.read.get() - r0) / 1e6
      val line = f"$name%-22s ${sec}%8.2f s  shuffleW=${wMb}%9.1f MB  " +
        f"shuffleR=${rMb}%9.1f MB  rows=$rows%,d"
      println(s"[scaleproof] $line")
      results += line
    }

    // bucket-size extremes of the scaled LSH table (the quadratic risk)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
      QueriesML.ShingleN, QueriesML.MinhashK)
    val bucketStats = Dedup.lshBands(sigs, "doc_id", QueriesML.MinhashK,
        QueriesML.MinhashBands)
      .groupBy(col("band"), col("band_key")).count()
      .agg(max("count").as("max"), expr("approx_percentile(count, 0.99)")
        .as("p99"), count(lit(1)).as("buckets"))
      .collect()(0)
    println(s"[scaleproof] lsh buckets: n=${bucketStats.getAs[Long]("buckets")} " +
      s"max=${bucketStats.getAs[Long]("max")} p99=${bucketStats.get(1)}")

    var cands: DataFrame = null
    phase("lsh_candidates") {
      cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        QueriesML.ShingleN, QueriesML.MinhashK, QueriesML.MinhashBands,
        maxBucketSize = Some(500)).cache()
      cands.count()
    }
    var verified: DataFrame = null
    phase("jaccard_verify") {
      verified = Dedup.jaccardVerifyPairs(cands, docs, "doc_id", "text",
        QueriesML.JaccardW, QueriesML.JaccardThreshold).cache()
      verified.count()
    }
    phase("min_label_clusters") {
      Dedup.minLabelClusters(docs.select("doc_id"), "doc_id",
        verified, "id_a", "id_b", rounds = 6).count()
    }
    phase("curation_job") {
      new CurationJob(spark, s"$work/documents.parquet", s"$work/curated")
        .run().collect()
      spark.read.parquet(s"$work/curated/chunks").count()
    }
    phase("embed_blocked") {
      Similarity.nearDupPairsBlocked(emb, "vec_id", "embedding",
        QueriesML.AnnDim, QueriesML.NearDupThreshold, QueriesML.AnnPlanes,
        QueriesML.NearDupTables).count()
    }
    // round-5 additions: span-level dedup at the hashed-shingle scale
    // configuration, PageRank over the (cached) candidate graph, and
    // the TopKAgg per-domain cap
    phase("repeated_spans_hash") {
      // toRdd: plain count() would let Catalyst eliminate the
      // zero-preserving left join and skip the span work entirely
      graft.operators.Spans.repeatedSpans(docs, "doc_id", "text",
        k = 5, minDocs = 2, hashShingles = true)
        .queryExecution.toRdd.count()
    }
    phase("pagerank_3it") {
      graft.operators.Graph.pageRank(docs.select("doc_id"), "doc_id",
        cands, "id_a", "id_b", iterations = 3).count()
    }
    phase("domain_cap") {
      graft.operators.Curation.domainCap(docs, "source", "doc_id",
        n = 1000, salt = "sp").count()
    }
    // round-5 additions: the EXACT prefix-filter join (recall-1 rival
    // of lsh_candidates + jaccard_verify above — same threshold, same
    // shingles, no banding misses) and SemDeDup over the replicated
    // embedding families (within-cell pair work only)
    phase("jaccard_prefix_join") {
      Dedup.jaccardPrefixJoin(docs, "doc_id", "text",
        QueriesML.JaccardW, QueriesML.JaccardThreshold).count()
    }
    phase("semdedup") {
      val cents = graft.operators.KMeans.fitOn(emb, "vec_id", "embedding",
        QueriesML.SemClusters, QueriesML.SemIters)
      // toRdd: count() would eliminate the unique-key left join that
      // carries the is_dup flag and skip the pair work
      Similarity.semDedup(cents, emb, "vec_id", "embedding",
        QueriesML.NearDupThreshold).queryExecution.toRdd.count()
    }

    println(s"[scaleproof] === summary (factor=$factor, docs=$nDocs, vecs=$nVecs) ===")
    results.foreach(l => println(s"[scaleproof] $l"))
    spark.stop()
  }
}
