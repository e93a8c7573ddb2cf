package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oracle-pair fuzzing (round-5 verdict ask #8): the 147 hand-paired
  * Spark/DuckDB queries are the repo's biggest correctness surface,
  * and the fixed driver gate can only ever certify them on ONE input.
  * A pairing that drifts — the Spark side and the SQL text agreeing on
  * the fixture by coincidence (a constant that happens to hold, a
  * tiebreak that never fires) — passes the gate forever. Fuzzing
  * re-checks the pair on PERTURBED inputs: drop a pseudo-random ~1/7
  * of every table's rows (the same subset on both sides, seeded so
  * runs are reproducible) and demand the hash gate still holds.
  *
  * The perturbation is applied once, at the storage layer: each table
  * is rewritten to a scratch dir with rows where
  * `hash(first_column, seed) % mod == 0` removed, and BOTH engines
  * read the same rewritten parquet — so there is no cross-engine
  * hash-function coupling; any disagreement is genuine pair drift.
  *
  * `events` is copied verbatim, NOT perturbed: its TIMESTAMP(NANOS)
  * physical layout cannot round-trip through a Spark rewrite (the
  * legacy nanosAsLong read degrades it to int64, which would change
  * what the oracle SQL sees). Queries reading only `events` are
  * therefore pointless to fuzz and excluded from [[DefaultQueries]].
  *
  * Excluded by design, with reasons:
  *  - source/sink gates (q_source_*, q_sink_*, q_reference_*,
  *    q_partitioned_write, streaming): read CSV/JDBC/HTTP fixtures or
  *    write side outputs — the perturbation surface is the parquet
  *    star schema.
  *  - q_sketch_*bound: gate 3-sigma probabilistic bounds that are
  *    per-dataset by documented design — a perturbed input may
  *    legitimately flip them (see QueriesPipeline caveat comments).
  *  - events-only queries (q_scd2, q_sessionize, ...): see above.
  *
  * Used by OracleFuzzSpec (2 seeds x [[DefaultQueries]], then
  * `tools/check.py` — the in-repo replica of the driver's DuckDB
  * gate — re-hashes every pair on the perturbed dir).
  */
object OracleFuzz {

  /** The highest-LoC eligible pairs: the composed dedup/graph/text
    * pipelines where Spark-side and SQL-side complexity (and therefore
    * drift surface) is largest, plus the round-6 additions
    * (q_video_decode's closed-form container oracle; q_bpe_apply's
    * DYNAMIC oracle, which re-trains its merge table on each perturbed
    * dir through the fitted-state reset below — fuzzing covers the
    * fitted-literal oracle pattern too). */
  val DefaultQueries: Seq[String] = Seq(
    "q_minhash_lsh_pairs", "q_ngram_jaccard", "q_simhash_pairs",
    "q_dedup_clusters", "q_cluster_keeper", "q_jaccard_prefix_join",
    "q_semdedup", "q_embed_neardup_blocked", "q_pagerank",
    "q_triangle_count", "q_repeated_spans", "q_wordpiece",
    "q_bm25_rank", "q_tfidf_top_terms", "q_lm_score",
    "q_collocations", "q_curation_pipeline", "q_snapshot_diff",
    "q_digest_resync", "q_decontaminate", "q_video_decode",
    "q_bpe_apply", "q_connected_components", "q_file_skipping",
    "q_zorder_skipping", "q_compaction", "q_time_travel",
    "q_table_merge", "q_change_feed", "q_delete_vectors",
    "q_schema_evolution", "q_incremental_mv", "q_bloom_skipping",
    "q_partition_overwrite",
    // round-7 additions: the change-stream lifecycle (drain + fold +
    // snapshot equality under a perturbed corpus), restore, write-time
    // constraints (the valid/rejected split shifts with the rows), and
    // the epoch permutation (hash-order oracle)
    "q_table_change_stream", "q_table_restore", "q_table_constraint",
    "q_epoch_shards", "q_table_wap",
    // metadata-only aggregate: min/max/count served from st lines must
    // track whatever rows the perturbation leaves; bucket-map join must
    // stay row-identical to the plain join on any input subset
    "q_table_stats_agg", "q_bucket_join", "q_join_mv",
    // round-7 late additions: COW UPDATE (pruned + probe updates track
    // the perturbed rows), schema enforcement (rejections must leave
    // zero residue on any input), hidden partitioning + partition
    // counts (tag pruning and metadata counts vs perturbed events),
    // ANALYZE (backfilled stats must describe the perturbed files)
    "q_table_update", "q_schema_enforce", "q_hidden_partitioning",
    "q_partition_counts", "q_table_analyze",
    // round-7 seventh batch: the scoped-OPTIMIZE + retention-vacuum
    // lifecycle must land the same snapshot on any input subset
    // (q_dpp_join is events-only — the perturbation can't reach it)
    "q_table_maintenance",
    // round-7 eighth batch: per-partition metadata stats must track
    // whatever rows the perturbation leaves; merge evolution's
    // NULL-backfill split shifts with the input
    "q_partition_stats", "q_merge_evolution",
    // round-7 ninth batch: incremental clustering's carried/fresh
    // split and the idempotent-replay no-op on any input subset
    "q_cluster_incremental",
    // NULL-count skipping's candidate set and row answer must track
    // the perturbed status mix
    "q_null_skipping",
    // string-range skipping: the date distribution (and therefore the
    // candidate set) shifts with the perturbed rows
    "q_string_skipping",
    // conditional merge: every clause's claimed row set shifts with
    // the perturbed keys
    "q_merge_when",
    // scan planner: every dimension's candidate set shifts with the
    // perturbed rows
    "q_scan_planner",
    // column mapping: the post-rename merge's touched-file set and
    // repriced rows shift with the perturbed keys
    "q_column_mapping",
    // tags: the pinned snapshot's content shifts with the perturbed rows
    "q_table_tags",
    // metadata count: the contained/boundary split and all three
    // counts shift with the perturbed rows
    "q_count_where",
    // DNF planner: each branch's candidate set shifts independently
    "q_scan_planner_or",
    // filtered min/max: extremes and the contained split shift
    "q_minmax_where",
    // round-9 SQL DML: the UPDATE's range (derived from the perturbed
    // max key) and SET'd row set, the MERGE's matched/deleted/inserted
    // splits, the partitioned-DDL counts, and the CALL lifecycle's
    // preserved content all shift with the input subset
    "q_catalog_update", "q_catalog_merge", "q_catalog_delete",
    "q_catalog_partitioned", "q_catalog_call",
    // round-10: the MOR routing's matched-row ratios, the skewed
    // MERGE's hot-key row set, and the Update-mode sink's changed-key
    // stream all shift with the perturbed input subset
    "q_catalog_delete_mor", "q_catalog_merge_skew", "q_stream_update",
    "q_catalog_update_mor",
    // round-10 second batch: the CTAS/RTAS/TRUNCATE snapshots and the
    // schema-evolving merge's matched/inserted splits all shift with
    // the perturbed orders subset
    "q_catalog_ctas", "q_catalog_merge_evolve",
    // round-11 additions under perturbation: the metadata-DELETE's
    // contained/boundary split, the spec-evolution pruning sets, the
    // branch lifecycle's published content, the adopted snapshot, and
    // the exact-decontamination hit set all shift with the input
    "q_catalog_delete_meta", "q_catalog_spec_evolve", "q_table_branch",
    "q_catalog_adopt", "q_decontaminate_exact",
    // round-12: the view-through aggregates, the cherry-picked merge
    // arithmetic (both sides' appends + the branch's tombstones), the
    // two-era default aggregate, the long-document and index-pruned
    // decontamination hit sets all shift with the perturbed subset
    "q_catalog_view", "q_catalog_cherry_pick", "q_catalog_default",
    "q_decontaminate_long", "q_decontaminate_index")

  /** Rewrite every table of `baseDir` into `outDir`, dropping rows
    * where hash(first column, seed) lands in 1 of `mod` residues.
    * Deterministic per seed; `events` copied byte-identical. */
  def perturb(spark: SparkSession, baseDir: String, outDir: String,
              seed: Int, mod: Int = 7): Unit = {
    Files.createDirectories(Paths.get(outDir))
    graft.Tables.names.foreach {
      case "events" =>
        Files.copy(Paths.get(s"$baseDir/events.parquet"),
          Paths.get(s"$outDir/events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      case name =>
        val df = spark.read.parquet(s"$baseDir/$name.parquet")
        val key = col(df.schema.head.name)
        // write the Spark directory, then flatten the single part file
        // to the flat-file layout the testdata (and DuckDB's
        // read_parquet) use
        val tmp = s"$outDir/.tmp_$name"
        df.filter(pmod(hash(key, lit(seed)), lit(mod)) =!= 0)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = Files.list(Paths.get(tmp)).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for $name"))
        Files.move(part, Paths.get(s"$outDir/$name.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        deleteRecursively(Paths.get(tmp))
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** The Verify dump loop (result parquet per query + oracle_sql.json)
    * without the session lifecycle — safe to call on a shared spec
    * session. Returns the names that threw. */
  def runQueries(spark: SparkSession, dataDir: String, outDir: String,
                 names: Seq[String]): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    // dynamic oracles (IVF/PQ/SemDeDup) inline centroids fitted on the
    // ONE dir exercised this JVM — re-establish that invariant per dir
    graft.QueriesML.resetFittedOracleState()
    val failed = names.flatMap { name =>
      val r = try {
        graft.SparkEntry.queries(name)(spark, dataDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[fuzz] $name failed: ${e.getMessage}")
        Some(name)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      r
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.filterNot(failed.contains)
      .map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed
  }
}
