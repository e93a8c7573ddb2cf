package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines: rule-based
  * quality filtering (Gopher-style), intra-document repetition signals,
  * benchmark decontamination, PII redaction, and edit-distance near-dup
  * verification.
  *
  * Design rules shared with the rest of the engine:
  *   - exact integer arithmetic (`DIV`, e2/e6 fixed-point) wherever a
  *     ratio feeds a THRESHOLD, so Spark and the DuckDB oracle agree
  *     bit-for-bit and the decision is engine-portable;
  *   - per-document signals are NARROW (array ops in one Project — no
  *     explode, no shuffle): at 100 TB these run as a pure map stage;
  *   - cross-document operators (decontamination) join on the shingle
  *     key with the small side broadcast, never all-pairs.
  */
object Curation {

  // -------------------------------------------------------------------
  // Rule-based quality filtering (the Gopher/C4-style rule family:
  // doc-length bounds, mean-word-length window, symbol share, stopword
  // presence). Each rule is a boolean column so downstream can both
  // filter and AUDIT which rule rejected a document.
  // -------------------------------------------------------------------

  /** Exact-integer quality signals in one narrow Project:
    * `n_words`, `mean_wl_e2` (mean word length ×100), `symbol_e6`
    * (non-alphanumeric-non-space char share ×1e6), `stop_hits`. */
  def qualitySignals(df: DataFrame, textCol: String,
                     stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val text = col(textCol)
    // counts are cast to BIGINT BEFORE the e2/e6 multiply: an int count
    // over ~21k (e6) would overflow 32-bit — ANSI crash or silent
    // negative — while the DuckDB oracle computes in BIGINT throughout
    df.withColumn("n_words", size(split(text, " ")))
      .withColumn("mean_wl_e2",
        expr(s"(CAST(length(regexp_replace($textCol, ' ', '')) AS BIGINT) * 100) " +
          "DIV n_words"))
      .withColumn("symbol_e6",
        expr(s"(CAST(length(regexp_replace(lower($textCol), '[a-z0-9 ]', '')) AS BIGINT) * 1000000) " +
          s"DIV greatest(length($textCol), 1)"))
      .withColumn("stop_hits", TextAnalysis.tokenSetCount(text, stopwords))
  }

  /** Default rule thresholds (tuned to split the synthetic corpus; at
    * production scale these are config). */
  val MinWords = 20
  val MaxWords = 90
  val MinMeanWlE2 = 400
  val MaxMeanWlE2 = 520
  val MaxSymbolE6 = 20000 // 2% symbol chars

  /** Signals + one boolean column per rule + the conjunction `keep`. */
  def qualityRules(df: DataFrame, textCol: String,
                   stopwords: Seq[String] = Seq("the", "a")): DataFrame =
    qualitySignals(df, textCol, stopwords)
      .withColumn("r_words",
        col("n_words").between(MinWords, MaxWords))
      .withColumn("r_mean_wl",
        col("mean_wl_e2").between(MinMeanWlE2, MaxMeanWlE2))
      .withColumn("r_symbol", col("symbol_e6") <= MaxSymbolE6)
      .withColumn("r_stop", col("stop_hits") >= 1)
      .withColumn("keep",
        col("r_words") && col("r_mean_wl") && col("r_symbol") && col("r_stop"))

  // -------------------------------------------------------------------
  // Intra-document repetition (the Gopher duplicate-n-gram signals):
  // fraction of duplicate tokens and duplicate word 2-grams, exact e6
  // fixed-point. Narrow — size/array_distinct, no explode.
  // -------------------------------------------------------------------

  val RepetitionMaxDup2gramE6 = 50000 // >5% duplicate 2-grams = repetitive

  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    // one compiled pass ([[graft.plans.DupStats]]: token + bigram
    // counts and distinct counts) instead of interpreted split +
    // transform(sequence) + two array_distinct — four array
    // materializations per row (2.11 -> 0.35 s at sf0.1, honest toRdd
    // protocol). Identical split/concat semantics, spec-pinned against
    // the declarative twin.
    val stats = org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.DupStats(
        org.apache.spark.sql.GraftSqlShims.expression(col(textCol))))
    df.withColumn("__ds", stats)
      .withColumn("dup_tok_e6",
        expr("((__ds[0] - __ds[1]) * 1000000) DIV __ds[0]"))
      .withColumn("dup_2gram_e6",
        expr("CAST(CASE WHEN __ds[2] = 0 THEN 0 ELSE " +
          "((__ds[2] - __ds[3]) * 1000000) DIV __ds[2] END AS BIGINT)"))
      .withColumn("repetitive", col("dup_2gram_e6") > RepetitionMaxDup2gramE6)
      .drop("__ds")
  }

  // -------------------------------------------------------------------
  // Benchmark decontamination: flag training documents sharing any word
  // w-gram with an evaluation set (the n-gram-collision protocol of the
  // GPT-3/PaLM decontamination appendices, on exact shingles).
  //
  // Scale shape: the eval side (benchmarks are ~1e4-1e6 shingles) is
  // DISTINCT'd then broadcast; the training side streams through a
  // broadcast hash join — no shuffle of the corpus. For an eval set too
  // big to broadcast, drop the hint and the same plan shuffles on the
  // shingle key. Counts are partial-aggregable per doc.
  // -------------------------------------------------------------------

  /** Training docs sharing ≥1 word `w`-gram with `evalDocs`. Returns
    * (idCol, n_shared_shingles = distinct shared shingles,
    * n_eval_docs = distinct eval docs hit). */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, w: Int): DataFrame = {
    val evalShingles = Dedup.wordShingles(evalDocs, idCol, textCol, w)
      .select(col("shingle"), col(idCol).as("__eval_id")).distinct()
    Dedup.wordShingles(train, idCol, textCol, w)
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("__eval_id")).as("n_eval_docs"))
  }

  // -------------------------------------------------------------------
  // EXACT-SUBSTRING decontamination: flag training documents containing
  // any benchmark string VERBATIM — the complement of the n-gram
  // collision protocol above (that one catches fuzzy overlap; this one
  // proves verbatim inclusion with zero false negatives, the standard
  // published-eval hygiene check).
  //
  // Scale shape: the benchmark side is driver-resident by definition
  // (eval suites are ~1e3-1e6 strings); each string's first-W-chars
  // anchor hash lands in ONE Bloom filter — sized at ~64 bits/anchor
  // with k=6 probes so the per-WINDOW false-positive rate is ~5e-7,
  // i.e. a per-DOCUMENT FP budget: even megabyte-long documents
  // survive the screen spuriously with probability well under 1 (the
  // property that keeps long-document corpora from all surviving) —
  // that rides the plan to every executor (8 MB per 1M anchors). The
  // corpus side pays one compiled O(chars) rolling-hash pass per
  // document (plans.Kernels.rollingBloomAnchors, O(1) slide) — a pure
  // narrow map, no shuffle — returning WHICH anchor hashes matched.
  // The exact re-check is then an anchor-hash EQUI-join: each matched
  // anchor joins to only the benchmark snippets sharing that anchor
  // (a BroadcastHashJoin), and contains() confirms the full snippet
  // per candidate pair. Bloom false positives match no true anchor
  // and fall out of the join for free, so stage 2 costs O(true hits),
  // never O(survivors × |bench|) — the nested-loop shape a boolean
  // screen forces. A benchmark string shorter than `window` lowers
  // the effective window to the set minimum — correctness never
  // depends on the window choice.
  // -------------------------------------------------------------------

  /** Training docs containing ≥1 `bench` string verbatim. Returns
    * (idCol, n_bench_hits = distinct benchmark entries contained).
    * Row-identical to the brute-force
    * `train JOIN bench ON contains(text, snip)` for any inputs:
    * stage 1 (Bloom of anchor rolling hashes) has no false negatives
    * — a contained snippet's first-w window IS a document window, so
    * its anchor hash is returned and equi-joins to the snippet —
    * and stage 2 re-checks containment exactly. */
  def decontaminateExact(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         benchIdCol: String, benchTextCol: String,
                         window: Int = 64): DataFrame = {
    val snips = bench
      .select(col(benchIdCol).cast("string").as("__bid"),
        col(benchTextCol).as("__btext"))
      .collect()
      .flatMap(r => Option(r.getString(1)).filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    require(snips.nonEmpty, "decontaminateExact: empty benchmark set")
    val w = math.min(window, snips.iterator.map(_._2.length).min)
    val anchors = snips.map(s => graft.plans.Kernels.windowHash(s._2, w))
      .distinct
    // ~64 bits per anchor (k=6 probes), power-of-two, >= 1024 bits:
    // the per-document FP budget for long-document corpora
    val bitsLog2 = math.max(10,
      64 - java.lang.Long.numberOfLeadingZeros(
        anchors.length.toLong * 64L - 1L))
    val words = graft.plans.Kernels.bloomBuild(anchors, bitsLog2.toInt)
    val matched = org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.RollingBloomAnchors(
        org.apache.spark.sql.GraftSqlShims.expression(col(textCol)),
        w, words))
    val s = train.sparkSession
    import s.implicits._
    val benchDf = snips.toSeq
      .map { case (bid, t) =>
        (graft.plans.Kernels.windowHash(t, w), bid, t) }
      .toDF("__anchor", "__bid", "__btext")
    train.select(col(idCol), col(textCol))
      .filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol), matched.as("__anchors"))
      .filter(size(col("__anchors")) > 0)
      .select(col(idCol), col(textCol),
        explode(col("__anchors")).as("__anchor"))
      .join(broadcast(benchDf), "__anchor")
      .filter(col(textCol).contains(col("__btext")))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__bid")).as("n_bench_hits"))
  }

  // -------------------------------------------------------------------
  // PII redaction: fold regexp_replace over a pattern table. Patterns
  // are RE2-compatible (no backrefs/lookarounds) so the oracle engine
  // applies literally the same regexes.
  // -------------------------------------------------------------------

  /** (name, pattern, replacement) — applied in declaration order; SSN
    * before phone so the narrower match wins on overlapping shapes. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "\\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** Adds `n_pii` (total matches across patterns, counted pre-redaction)
    * and `redacted` (all patterns replaced, in order). Narrow. */
  def redactPii(df: DataFrame, textCol: String,
                patterns: Seq[(String, String, String)] = PiiPatterns): DataFrame = {
    val text = col(textCol)
    val counts = patterns.map { case (_, p, _) =>
      size(regexp_extract_all(text, lit(p), lit(0)))
    }.reduce(_ + _)
    val redacted = patterns.foldLeft(text) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r)
    }
    df.withColumn("n_pii", counts).withColumn("redacted", redacted)
  }

  // -------------------------------------------------------------------
  // Edit-distance near-dup verification: exact Levenshtein distance on
  // CANDIDATE pairs only (compose with Dedup.minhashCandidates — the
  // same LSH→verify shape as ngram Jaccard). levenshtein() is a
  // codegen'd built-in in Spark; the relative threshold is exact
  // integer: lev * 100 <= maxRelE2 * max(len_a, len_b).
  // -------------------------------------------------------------------

  /** Source-mixture sampling weights: per-group document/token counts
    * plus the resampling weight that moves the corpus to a UNIFORM
    * token share per group — weight_e6 = 1e6 x target_share /
    * current_share = 1e6 x total_tokens / (n_groups x group_tokens).
    * Weight > 1e6 means upsample, < 1e6 downsample; feed it to a
    * deterministic hash sampler (the q_sample_split shape) to realize
    * the mix. The domain-mixing knob every training-data pipeline
    * tunes (e.g. web vs code vs reference shares).
    *
    * Shape: one partial-aggregated groupBy (shuffle O(groups)); the
    * whole-frame window then runs on the GROUPS frame only — a few
    * rows — never on the corpus. Exact-integer e6 arithmetic: safe
    * while total_tokens < 9.2e12 (Long.Max / 1e6); switch the multiply
    * to DECIMAL(38,0) beyond that. */
  def mixtureWeights(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy()
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokensOf(col(textCol))).cast("long"))
          .as("n_tokens"))
      .withColumn("__total", sum(col("n_tokens")).over(whole))
      .withColumn("__groups", count(lit(1)).over(whole))
      .withColumn("weight_e6",
        expr("(__total * 1000000) DIV (__groups * n_tokens)"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("weight_e6"))
  }

  /** Temperature-scaled mixture shares (alpha = 0.5, the multilingual-
    * corpus standard: sampling probability proportional to size^alpha
    * up-weights small sources relative to proportional sampling while
    * still favoring large ones). share_ppm = floor(sqrt(n_tokens)) *
    * 1e6 DIV sum of floor-sqrts — floor(sqrt) of an int64 below 2^52
    * is exact in every IEEE engine (sqrt is correctly rounded), so the
    * shares stay integer-deterministic with no float pow anywhere.
    * One partial-aggregated groupBy + a window over the tiny
    * groups-only frame. */
  def mixtureTemperature(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy()
    df.groupBy(col(groupCol))
      .agg(sum(size(TextAnalysis.tokensOf(col(textCol))).cast("long"))
        .as("n_tokens"))
      .withColumn("w_sqrt", floor(sqrt(col("n_tokens"))).cast("long"))
      .withColumn("__total", sum(col("w_sqrt")).over(whole))
      .withColumn("share_ppm", expr("(w_sqrt * 1000000) DIV __total"))
      .select(col(groupCol), col("n_tokens"), col("w_sqrt"),
        col("share_ppm"))
  }

  def editDistancePairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                        textCol: String, maxRelE2: Int): DataFrame = {
    val texts = docs.select(col(idCol), col(textCol))
    // Global DP band: every per-pair threshold is <= maxRelE2% of the
    // corpus max length, so levenshtein(..., t0) — Spark's banded
    // early-exit form, O(len x t0) instead of O(len^2), -1 past the
    // band — is EXACT for every pair that can pass the filter. The
    // one-column scan computing maxLen is trivial next to the DP; a
    // production pipeline passes it from table stats instead.
    val maxLenRow = docs.agg(max(length(col(textCol)))).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    val t0 = maxLen * maxRelE2 / 100 + 1
    pairs
      // candidate rows are bytes-tiny but each costs an O(len^2) DP —
      // spread them before the compute stage (AQE sizes by bytes)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      // no broadcast hint (same reasoning as Dedup.jaccardVerifyPairs):
      // the planner broadcasts small text tables itself; forcing it
      // would cap the corpus at driver memory
      .join(texts.select(col(idCol).as("id_a"),
        col(textCol).as("__t_a")), "id_a")
      .join(texts.select(col(idCol).as("id_b"),
        col(textCol).as("__t_b")), "id_b")
      .withColumn("__la", length(col("__t_a")))
      .withColumn("__lb", length(col("__t_b")))
      // exact prefilter (lev >= |len_a - len_b|): kills a pair without
      // running any DP at all
      .filter(abs(col("__la") - col("__lb")) * 100
        <= greatest(col("__la"), col("__lb")) * maxRelE2)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__t_a"), col("__t_b"), t0).as("lev"),
        greatest(col("__la"), col("__lb")).as("__max_len"))
      .filter(col("lev") >= 0 && col("lev") * 100 <= col("__max_len") * maxRelE2)
      .select(col("id_a"), col("id_b"), col("lev"))
  }

  // -------------------------------------------------------------------
  // Mixture REALIZATION: materialize a target domain mix with a
  // deterministic hash sampler. mixtureWeights (above) computes the
  // knob; this applies it — together they are the plan+execute halves
  // of domain re-weighting.
  // -------------------------------------------------------------------

  /** Deterministic per-group subsample: keep a row iff its salted hash
    * bucket (out of 1e6) falls below the group's rate. Rates are given
    * in parts-per-million so the threshold compare is exact integer —
    * the same row set is selected by any engine, any partitioning, any
    * cluster size (no `sample()`, no RNG state). Groups absent from
    * `ratesPpm` keep `defaultPpm`.
    *
    * Scale shape: pure narrow map — one md5 per row, no shuffle, no
    * per-group state; composes with mixtureWeights by converting
    * weight_e6 below 1e6 into a ppm rate (upsampling instead needs
    * integer replication + fractional hash keep; see Chunking for the
    * fan-out shape).
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    ratesPpm: Map[String, Int], defaultPpm: Int,
                    salt: String): DataFrame = {
    require((defaultPpm +: ratesPpm.values.toSeq)
      .forall(p => p >= 0 && p <= 1000000), "rates are ppm in [0, 1e6]")
    val thr = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    val bucket = graft.functions.StableHash.stable32(
      concat(col(idCol).cast("string"), lit(salt))) % 1000000
    df.filter(bucket < thr)
  }

  /** Mixture realization with UPSAMPLING: rates may exceed 1e6 ppm, in
    * which case a row is replicated `rate DIV 1e6` times plus one more
    * iff its hash bucket falls under the fractional remainder — e.g.
    * 2_500_000 ppm emits every row twice and half the rows (chosen by
    * hash) a third time. Output adds a `copy` column (0-based replica
    * index) so downstream shuffles spread the replicas and exact dedup
    * keys stay unique. Downsampling (rate < 1e6) degenerates to
    * [[mixtureSample]] with `copy = 0`.
    *
    * Scale shape: narrow map + bounded fan-out (`explode` of a
    * sequence literal-sized per row) — no shuffle; the expected output
    * volume is exactly sum(rate_g x |g|) / 1e6. Epoch-varying `salt`
    * rotates WHICH rows get the extra fractional copy, so repeated
    * epochs don't always over-train the same documents.
    */
  def mixtureResample(df: DataFrame, groupCol: String, idCol: String,
                      ratesPpm: Map[String, Int], defaultPpm: Int,
                      salt: String): DataFrame = {
    require((defaultPpm +: ratesPpm.values.toSeq).forall(_ >= 0),
      "rates are ppm >= 0")
    val thr = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    val bucket = graft.functions.StableHash.stable32(
      concat(col(idCol).cast("string"), lit(salt))) % 1000000
    val copies = (thr.cast("long") / 1000000).cast("long") +
      when(bucket < thr % 1000000, 1L).otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Per-domain document cap: keep at most `n` rows per group, chosen
    * by salted-hash priority (uniform within the group, stable across
    * engines/cluster sizes; ties broken by id). The anti-skew guard
    * for web corpora where a handful of domains contribute unbounded
    * document counts.
    *
    * NOT a window row_number: that shuffles every row of the hottest
    * domain to one reducer. The top-n cut runs as a
    * TypedImperativeAggregate ([[graft.plans.TopKAgg]]) — each map
    * task reduces its partition to at most n candidates per group
    * BEFORE the shuffle (volume O(groups x n x partitions), corpus-
    * size independent), then a semi join keeps the winners. Requires
    * long ids (the TopKAgg key type).
    */
  def domainCap(df: DataFrame, groupCol: String, idCol: String,
                n: Int, salt: String): DataFrame = {
    require(n > 0, "cap must be positive")
    // negate: TopKAgg keeps score DESC (id ASC on ties) => smallest
    // hash wins, matching ORDER BY priority, id in the SQL twin.
    // Hash < 2^32 is exact in Double, so negation loses nothing.
    val priority = graft.functions.StableHash.stable32(
      concat(col(idCol).cast("string"), lit(salt)))
    val topk = org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.TopKAgg(
        org.apache.spark.sql.GraftSqlShims.expression(col(idCol).cast("long")),
        org.apache.spark.sql.GraftSqlShims.expression(-priority.cast("double")),
        n).toAggregateExpression())
    val keep = df.groupBy(col(groupCol)).agg(topk.as("__topk"))
      .select(explode(col("__topk.id")).as("__keep_id"))
    df.join(keep, col(idCol) === col("__keep_id"), "left_semi")
  }

  /** EPOCH SHUFFLE for training-data loaders: a deterministic global
    * permutation of the corpus into `numShards` balanced shards, each
    * with a dense within-shard position — the "shuffle 100 TB for
    * epoch k" primitive. No total sort and no driver state: the
    * salted hash assigns every row its shard (uniform, so shards
    * balance to O(sqrt) fluctuations) AND its rank inside the shard;
    * the only exchange is the hash partition on `shard`, and the
    * per-reducer sort is one shard's worth (corpus/numShards — the
    * knob that keeps reducers bounded as the corpus grows; at 100 TB
    * run with numShards ~ tens of thousands, i.e. shard files of a
    * few GB, exactly what loader infrastructure wants). Changing
    * `epoch` re-permutes everything — shard membership and order —
    * so successive epochs see the data in unrelated orders, while
    * the same (epoch, corpus) pair replays byte-identically on any
    * cluster size or engine (the md5 hash family is portable; gate
    * q_epoch_shards hash-matches DuckDB's row_number twin).
    *
    * Output = input columns + `shard` (0-based) + `pos` (1-based,
    * dense within shard). */
  def epochShards(df: DataFrame, idCol: String, numShards: Int,
                  epoch: String): DataFrame = {
    require(numShards > 0, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.StableHash.stable32(
      concat(col(idCol).cast("string"), lit(":"), lit(epoch)))
    val shard = (h % numShards).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
  }
}
