package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 (10x) scale proof for the round-5 tail operators (round-5
  * verdict ask #6): overlap join, digest re-sync, gap-fill, and the
  * global-prefix-sum concurrency sweep were only ever measured at
  * sf0.1 — this runs their EXACT gate-query shapes on a 10x-replicated
  * corpus and meters wall + shuffle bytes, the same evidence
  * [[ScaleProof]] produces for the dedup path.
  *
  * Replication axes (chosen per operator semantics — each grows the
  * dimension that 100 TB actually grows):
  *  - lineitem/orders: keys shifted per replica (o_orderkey,
  *    l_orderkey, l_suppkey) — horizontal growth: 10x the suppliers /
  *    orders at the SAME per-key interval density, the realistic axis
  *    for supplier-keyed interval joins and key-range digests. (Density
  *    growth is a separate knob, governed by RangeJoin's bucketWidth.)
  *  - events: user_id shifted per replica AND ts jittered +r
  *    microseconds, so the concurrency sweep's distinct boundary-
  *    instant count — the prefix-sum work axis — genuinely grows ~10x
  *    rather than stacking deltas on the same instants.
  *
  * Scaled tables are written under the standard names so each phase
  * runs the REAL `SparkEntry.queries` entry unmodified against the
  * scaled dir — nothing here can drift from what the gate certifies.
  *
  * Usage: runMain graft.tools.ScaleProofTail [sfDir] [factor] [workDir]
  *          [query,query,...]   (4th arg filters the phase list)
  */
object ScaleProofTail {
  private final class ShuffleMeter extends SparkListener {
    val write = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_scaleproof_tail")
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

    val r = explode(sequence(lit(0), lit(factor - 1))).as("r")
    val keyOff = 100000000L

    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("*"), r)
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * keyOff)
      .drop("r").repartition(64)
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("*"), r)
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * keyOff)
      .withColumn("l_suppkey", col("l_suppkey") + col("r") * 1000000)
      .drop("r").repartition(64)
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    // events: go through Tables.events (normalizes the NANOS layout to
    // ts_ns) and write the long layout back; Tables.events reads it
    // via its LongType branch. +r us jitter keeps replicas' session
    // boundaries distinct instants.
    graft.Tables.events(spark, sfDir)
      .select(col("*"), r)
      .withColumn("event_id", col("event_id") + col("r") * keyOff)
      .withColumn("user_id", col("user_id") + col("r") * 1000000)
      .withColumn("ts", col("ts_ns") + col("r") * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    // documents (round-6 proof targets: BPE, CC, video, compaction):
    // same near-identical-replica shape as ScaleProof
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("*"), r)
      .withColumn("doc_id", col("doc_id") + col("r") * keyOff)
      .withColumn("text",
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("r"))))
      .drop("r").repartition(32)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    // customer: copied UNscaled — the bucket-join proof grows the fact
    // side 10x against a fixed dimension, the axis 100 TB actually grows
    spark.read.parquet(s"$sfDir/customer.parquet")
      .write.mode("overwrite").parquet(s"$work/customer.parquet")
    // embeddings: vec_id shifted per replica (the ANN corpus grows
    // 10x; queries stay the low-id band, so the probe fans over a
    // 10x-bigger indexed estate)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("*"), r)
      .withColumn("vec_id", col("vec_id") + col("r") * keyOff)
      .drop("r").repartition(16)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val nOrd = spark.read.parquet(s"$work/orders.parquet").count()
    val nLi = spark.read.parquet(s"$work/lineitem.parquet").count()
    val nEv = spark.read.parquet(s"$work/events.parquet").count()
    val nDoc = spark.read.parquet(s"$work/documents.parquet").count()
    println(s"[scaletail] corpus x$factor: orders=$nOrd lineitem=$nLi " +
      s"events=$nEv documents=$nDoc")

    def phase(name: String): Unit = {
      System.gc()
      val (w0, r0) = (meter.write.get(), meter.read.get())
      val t0 = System.nanoTime()
      // toRdd.count: force every output column (Bench protocol)
      val rows = graft.SparkEntry.queries(name)(spark, work)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val wMb = (meter.write.get() - w0) / 1e6
      val rMb = (meter.read.get() - r0) / 1e6
      println(f"[scaletail] $name%-18s ${sec}%8.2f s  shuffleW=${wMb}%9.1f MB  " +
        f"shuffleR=${rMb}%9.1f MB  rows=$rows%,d")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    Seq("q_overlap_join", "q_digest_resync", "q_gapfill", "q_concurrency",
      // round-6 additions: table layer + BPE + CC + video at 10x
      "q_file_skipping", "q_zorder_skipping", "q_compaction",
      "q_time_travel", "q_table_merge", "q_bpe_apply",
      "q_connected_components", "q_video_decode",
      // round-6 second batch: CDF / DV / evolution / MV / bloom /
      // OPTIMIZE at 10x
      "q_change_feed", "q_delete_vectors", "q_schema_evolution",
      "q_incremental_mv", "q_bloom_skipping", "q_table_compact",
      // round-6 late addition: dynamic partition overwrite at 10x
      "q_partition_overwrite",
      // round-7: change-feed streaming drain, restore, CHECK
      // constraints at 10x
      "q_table_change_stream", "q_table_restore", "q_table_constraint",
      // round-7 second batch: WAP publish, shallow clone, streaming
      // CDC merge, the curated-corpus flagship composition
      "q_table_wap", "q_table_clone", "q_stream_table_cdc",
      "q_curated_table", "q_warehouse_sync",
      // round-7 third batch: metadata-only aggregates over the delta-
      // encoded manifest log, and the bucket-map join at 10x
      "q_table_stats_agg", "q_bucket_join", "q_join_mv",
      // round-7 fourth batch: COW UPDATE, write-time schema
      // enforcement, and hidden partitioning at 10x
      "q_table_update", "q_schema_enforce", "q_hidden_partitioning",
      "q_partition_counts", "q_table_analyze",
      // round-7 seventh batch: join-driven file pruning and the
      // scoped-OPTIMIZE + retention-vacuum lifecycle at 10x
      "q_dpp_join", "q_table_maintenance",
      // round-7 eighth batch: per-partition metadata stats, merge
      // schema evolution at 10x
      "q_partition_stats", "q_merge_evolution",
      // round-7 ninth batch: incremental clustering + idempotent
      // ingest at 10x
      "q_cluster_incremental", "q_null_skipping", "q_string_skipping",
      // round-7 twelfth batch: conditional merge at 10x
      "q_merge_when", "q_scan_planner", "q_column_mapping",
      "q_auto_maintain", "q_table_tags", "q_count_where",
      "q_scan_planner_or", "q_minmax_where",
      // round-8: DSv2 catalog SQL (filter/agg pushdown through
      // Catalyst) and the readStream CDC source at 10x
      "q_catalog_sql_read", "q_catalog_agg_pushdown",
      "q_catalog_time_travel", "q_catalog_ddl_roundtrip",
      "q_stream_source_cdc",
      // round-9: SQL row-level DML (group-based COW UPDATE/MERGE with
      // runtime group filtering), SQL DELETE, partitioned DDL, and
      // the streaming sink loop at 10x
      "q_catalog_update", "q_catalog_merge", "q_catalog_delete",
      "q_catalog_partitioned", "q_stream_sink", "q_catalog_call",
      // round-10: skewed-ON-key MERGE (runtime group filtering's
      // matching-rows subquery under a hot key, broadcast disabled),
      // merge-on-read SQL DELETE routing, Update-mode streaming sink,
      // SQL metadata tables at 10x
      "q_catalog_merge_skew", "q_catalog_delete_mor", "q_stream_update",
      "q_catalog_metadata", "q_catalog_update_mor",
      // round-10 second batch: atomic CTAS/RTAS/TRUNCATE through the
      // staging catalog, and MERGE WITH SCHEMA EVOLUTION (COW + MOR)
      // at 10x
      "q_catalog_ctas", "q_catalog_merge_evolve",
      // round-11: metadata-only DELETE routing, partition-spec
      // evolution, named branches, SQL onboarding, exact-substring
      // decontamination at 10x
      "q_catalog_delete_meta", "q_catalog_spec_evolve",
      "q_table_branch", "q_catalog_adopt", "q_decontaminate_exact",
      // round-12: exact-substring decontamination re-proved after the
      // per-document-FP Bloom + anchor-equi-join fix, its
      // long-document variant (the corpus shape that broke the old
      // screen), text-anchor file skipping, SQL views, branch
      // cherry-pick, and ADD COLUMN DEFAULT at 10x
      "q_decontaminate_long", "q_decontaminate_index",
      "q_catalog_view", "q_catalog_cherry_pick", "q_catalog_default",
      // round-13: persisted vector index (build + probe + stale
      // append), MV DDL refresh, generated columns, the multi-table
      // txn, and the decontamination index re-proved with the
      // DISTRIBUTED probe (the round-12 weak)
      "q_ann_index", "q_catalog_mv", "q_table_generated",
      "q_table_txn")
      .filter(n => args.lift(3).map(_.split(",").toSet)
        .forall(_.contains(n)))
      .foreach(phase)
    spark.stop()
  }
}
