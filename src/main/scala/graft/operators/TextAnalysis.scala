package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StableHash

/** Text-corpus analysis for training-data pipelines: token statistics,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All expressions are built-in / codegen'd (no UDFs) and narrow (no
  * shuffle): at 100 TB these run as a pure map stage over the corpus.
  */
object TextAnalysis {

  /** Default stopword sets for the language-ID heuristic. First match
    * (strict greater-than in declaration order) wins; fallback "und". */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  def tokensOf(text: Column): Column = split(text, " ")

  /** Count of tokens belonging to `set`: a codegen'd kernel expression
    * (plans.TokenSetCount) embedded directly — no registry, works on
    * any session. Declarative twin (the spec/oracle form) kept in
    * [[tokenSetCountDeclarative]]. */
  def tokenSetCount(text: Column, set: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.TokenSetCount(
        org.apache.spark.sql.GraftSqlShims.expression(text), set))

  /** HOF specification of [[tokenSetCount]] (test oracle). */
  def tokenSetCountDeclarative(text: Column, set: Seq[String]): Column = {
    val arr = array(set.map(lit): _*)
    size(filter(tokensOf(text), t => array_contains(arr, t)))
  }

  /** Per-document statistics: token count, char count, average token
    * length, stopword ratio, punctuation ratio. */
  def stats(df: DataFrame, textCol: String,
            stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val text = col(textCol)
    val nTokens = size(tokensOf(text))
    df.withColumn("n_tokens", nTokens)
      .withColumn("n_chars_m", length(text))
      .withColumn("stop_hits", tokenSetCount(text, stopwords))
      .withColumn("punct_chars",
        length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
  }

  /** Composite quality score in [0,1]-ish: penalize very short docs,
    * high stopword share, high punctuation share. Single deterministic
    * double expression (exact-int numerators / denominators). */
  def qualityScore(nTokens: Column, stopHits: Column,
                   punctChars: Column, nChars: Column): Column = {
    val lengthTerm = least(nTokens, lit(100)).cast("double") / lit(100.0)
    val stopTerm = lit(1.0) - stopHits.cast("double") / greatest(nTokens, lit(1)).cast("double")
    val punctTerm = lit(1.0) - punctChars.cast("double") / greatest(nChars, lit(1)).cast("double")
    (lengthTerm + stopTerm + punctTerm) / lit(3.0)
  }

  /** Stopword-profile language ID: count hits per language's stopword
    * set; argmax with first-declared-wins tiebreak; "und" if all zero. */
  def langId(text: Column,
             profiles: Seq[(String, Seq[String])] = LangStopwords): Column = {
    val counts = profiles.map { case (lang, words) =>
      lang -> tokenSetCount(text, words)
    }
    val maxCount = greatest(counts.map(_._2): _*)
    counts.foldRight(lit("und"): Column) { case ((lang, cnt), el) =>
      when(cnt > 0 && cnt === maxCount, lit(lang)).otherwise(el)
    }
  }

  /** BPE-ish subword token count: word-pieces, digit runs, and
    * punctuation runs each count as one token (a cheap stand-in for a
    * real BPE vocabulary — the regex shape, not the merges). */
  val BpeishPattern: String = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Content fingerprint: md5 of normalized text (exact-dup key). */
  def contentFingerprint(text: Column): Column =
    md5(lower(trim(text)))

  /** Rolling-hash document fingerprint: minimum stable hash over all
    * character n-gram shingles — a 1-function minhash, usable as a
    * cheap near-dup blocking key. Narrow, and compiled: reuses the
    * [[graft.plans.ShingleHash32]] codegen kernel (distinct shingles —
    * min is unaffected by deduplication) instead of the interpreted
    * transform/substr/md5 chain, which re-walked an expression tree
    * per character position (2.11 -> 1.51 s at sf0.1, honest toRdd
    * protocol; the remaining cost is the 1.5M md5 evaluations the
    * stable32 portability contract requires). */
  def shingleFingerprint(text: Column, n: Int = 8): Column =
    array_min(org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.ShingleHash32(
        org.apache.spark.sql.GraftSqlShims.expression(text), n)))

  /** Top-k TF-IDF terms per document, in exact integer arithmetic so
    * the ranking is engine-portable: score_e6 = (tf * 10^6 * n_docs)
    * DIV df — a monotone transform of tf * (N/df), no float log.
    *
    * Scale shape: tf is a partial-aggregable (doc, term) count; df is a
    * second partial aggregate over tf (already deduplicated — count,
    * not count-distinct); the corpus size joins in as a broadcast
    * 1-row frame (never a window-over-nothing, which would single-
    * partition the data); final top-k is one window shuffle on doc.
    */
  /** Corpus-level boilerplate detection: the k most frequent word
    * n-grams with their occurrence and document counts, totally ordered
    * by (n_docs desc, n_occurrences desc, ngram asc) so the top-k set
    * is deterministic. High-document-frequency n-grams are navigation
    * chrome / license headers / template text — the removal list a
    * curation pipeline feeds back into a filter.
    *
    * Shape: tokenize once in a narrow project, explode to (doc, ngram),
    * one partial-aggregated groupBy on the ngram key (count and
    * distinct-doc count), then a global top-k — k rows through the
    * final ordering, never the corpus. The string n-grams ARE the
    * deliverable here (a human reads the list); the hashed-shingle
    * kernels (plans.WordShingleArray) remain the match-only scale
    * path. */
  def commonNgrams(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 20): DataFrame = {
    val grams = df
      .select(col(idCol), tokensOf(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= n)
      .select(col(idCol), explode(
        expr(s"transform(sequence(1, size(__ws) - ${n - 1}), " +
          s"i -> array_join(slice(__ws, i, $n), ' '))")).as("ngram"))
    grams.groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("n_occurrences").desc,
        col("ngram").asc)
      .limit(k)
  }

  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokensOf(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("score_e6", expr("(tf * 1000000 * n_docs) DIV df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score_e6"), col("rnk"))
  }

  /** Corpus vocabulary: the `topV` most frequent whitespace tokens with
    * total count and deterministic rank (count desc, token asc).
    *
    * Shape at 100 TB: explode is narrow; the token count is one
    * partial-aggregated shuffle on the token key (map-side combine
    * collapses each partition to its distinct-token counts); the top-V
    * cut plans as TakeOrderedAndProject — every partition forwards at
    * most V rows, no global sort. */
  def vocabulary(df: DataFrame, textCol: String, topV: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(tokensOf(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topV)
    // rank over the V-row result: the window partitions a frame that is
    // already <= V rows, so the single-partition window is O(V), not a
    // corpus-wide serialization
    counts.withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
      .select(col("token"), col("cnt"), col("rank"))
  }

  /** Collocation mining: adjacent token pairs ranked by pointwise
    * mutual information — the association statistic behind BPE merge
    * selection and phrase vocabularies. For each bigram (a, b) with
    * count >= `minCount`:
    * pmi_ratio_e6 = c(a,b) · N · 1e6 / (c(a) · c(b))  (exact integer),
    * where N is the corpus token count. Output is the deterministic
    * top-`topK` by (pmi desc, bigram count desc, a asc, b asc).
    *
    * Shape at 100 TB: bigram fan-out is narrow (zip of the token array
    * with its tail); both count aggregations are partial map-side; the
    * top-K cut is TakeOrderedAndProject. The e6 numerator
    * c(a,b)·N·1e6 fits a long up to N ~ 10^12 tokens ONLY for bigram
    * counts < 10^6 / (N/10^12); past that, swap the expression to
    * DECIMAL(38,0) — the formula is unchanged. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
                   topK: Int): DataFrame = {
    val toks = df.select(tokensOf(col(textCol)).as("toks"))
    val tail1 = greatest(size(col("toks")) - 1, lit(0))
    val bigrams = toks.select(explode(
        zip_with(slice(col("toks"), lit(1), tail1),
          slice(col("toks"), lit(2), tail1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = toks.select(sum(size(col("toks"))).as("n_tokens"))
    bigrams
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi_ratio_e6",
        expr("c12 * n_tokens * 1000000 DIV (c1 * c2)"))
      .orderBy(col("pmi_ratio_e6").desc, col("c12").desc,
        col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("c12"), col("pmi_ratio_e6"))
  }

  /** BM25 document ranking for a literal term query, in exact integer
    * fixed point. Per matching term t in doc d:
    *
    *   idf_e6(t)  = N · 1e6 DIV df(t)            (same integer-ratio IDF
    *                family as [[tfidfTopTerms]] — monotone in 1/df; the
    *                ln() of textbook BM25 is float and engine-varying)
    *   L_e6(d)    = dl(d) · N · 1e6 DIV total_tokens   (dl/avgdl)
    *   D_e6       = tf·1e6 + k1(1-b)·1e6 + (k1·b)·L_e6
    *   sat_e6     = tf·(k1+1)·1e12 DIV D_e6      (the saturating-tf term,
    *                ≤ (k1+1)·1e6 by construction)
    *   score_e6(d)= Σ_t idf_e6 · sat_e6 DIV 1e6
    *
    * k1 and b arrive as fixed-point ints (k1E1 = 10·k1, bE2 = 100·b) so
    * every engine computes bit-identical scores. Output: top-`topK`
    * docs by (score desc, id asc) with the matched-term count.
    *
    * Shape at 100 TB: the term filter lands BEFORE the tf aggregation,
    * so only postings of the query's terms flow into the shuffle —
    * O(Σ df(t)) rows, not O(corpus). df and the corpus totals are
    * broadcast (|query| rows and 1 row). The top-K cut is
    * TakeOrderedAndProject. Long bounds: tf·(k1E1+10)·1e11 needs
    * tf < ~4·10^6 — any real document qualifies. */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], topK: Int,
                  k1E1: Int = 12, bE2: Int = 75): DataFrame = {
    val base = df.select(col(idCol),
      tokensOf(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("dl"))
    val totals = base.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
    val toks = base.select(col(idCol), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(totals))
      .withColumn("idf_e6", expr("nd * 1000000 DIV df"))
      .withColumn("l_e6", expr("dl * nd * 1000000 DIV tt"))
      .withColumn("d_e6", expr(
        s"tf * 1000000 + ${k1E1.toLong * (100 - bE2) * 1000}" +
          s" + (${k1E1.toLong * bE2} * l_e6) DIV 1000"))
      .withColumn("sc", expr(
        s"(idf_e6 * ((tf * ${(k1E1 + 10).toLong * 100000000000L}) DIV d_e6)) DIV 1000000"))
      .groupBy(col(idCol))
      .agg(sum(col("sc")).as("bm25_e6"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25_e6").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Language-model count tables with Kneser-Ney continuation counts:
    * for each bigram (w1, w2) seen at least `minCount` times —
    * bigram count c12, unigram counts c1/c2, and the KN diversity
    * statistics computed over ALL observed bigram TYPES (not just the
    * frequent ones): left_types(w2) = |{w : c(w, w2) > 0}| (the KN
    * continuation numerator) and right_types(w1) = |{w : c(w1, w) > 0}|
    * (the KN back-off normalizer). Deterministic top-`topK` by
    * (c12 desc, w1 asc, w2 asc).
    *
    * Shape at 100 TB: one shuffle builds the distinct bigram-type
    * counts (map-side combined); the type-diversity tables are second
    * aggregations OVER that already-collapsed table (O(bigram types),
    * not O(tokens)); unigram counts are partial-agg; the final joins
    * key on single tokens. Top-K is TakeOrderedAndProject. */
  def ngramLmCounts(df: DataFrame, textCol: String, minCount: Long,
                    topK: Int): DataFrame = {
    val toks = df.select(tokensOf(col(textCol)).as("toks"))
    val tail1 = greatest(size(col("toks")) - 1, lit(0))
    val allBig = toks.select(explode(
        zip_with(slice(col("toks"), lit(1), tail1),
          slice(col("toks"), lit(2), tail1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val leftTypes = allBig.groupBy("w2")
      .agg(count(lit(1)).as("left_types"))
    val rightTypes = allBig.groupBy("w1")
      .agg(count(lit(1)).as("right_types"))
    allBig.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .join(rightTypes, "w1")
      .join(leftTypes, "w2")
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("left_types"), col("right_types"))
  }

  /** Per-document out-of-vocabulary statistics against a vocabulary
    * frame (as produced by [[vocabulary]]): token count, OOV token
    * count, and OOV rate in exact e6 fixed-point (engine-portable —
    * no float division).
    *
    * The vocabulary is broadcast (V is small by construction); the
    * per-doc aggregation is partial map-side. A doc with zero tokens
    * never occurs (split of "" yields [""]), so the division is safe. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokensOf(col(textCol))).as("token"))
    toks.join(broadcast(vocab.select(col("token"),
        lit(1).as("__in_vocab"))), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate_e6", expr("n_oov * 1000000 DIV n_tokens"))
  }

  /** Standard text-normalization ladder for dedup/canonicalization:
    * Unicode NFC composition (codegen'd [[graft.plans.NfcNormalize]]
    * kernel — `java.text.Normalizer`, same canonical composition as
    * DuckDB's `nfc_normalize`), Unicode lowercasing, whitespace-run
    * collapse, and edge trim. Pure narrow map, stays inside
    * whole-stage codegen; run it BEFORE hashing/shingling so visually
    * identical text (composed vs decomposed accents, case, spacing)
    * dedups together. */
  def normalizeText(text: Column): Column = {
    val nfc = org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.NfcNormalize(
        org.apache.spark.sql.GraftSqlShims.expression(text)))
    trim(regexp_replace(lower(nfc), "[ \\t\\n\\r]+", " "))
  }

  /** Corpus-frequency language-model score per document: the mean
    * corpus probability of the document's tokens, in exact ppm
    * integers — `score_ppm = avg over tokens of (count(token) * 1e6
    * DIV corpus_tokens)`. The integer-exact stand-in for perplexity
    * filtering (CCNet-style): documents dominated by rare/garbage
    * tokens score near 0, template/stopword text scores high; rank or
    * threshold on it exactly like a MONOTONE transform of a unigram
    * LM's per-token probability (no float log, so the score — unlike a
    * log-likelihood — is engine-portable and hash-gateable).
    *
    * Scale shape: token frequencies are one partial-aggregated groupBy
    * on the token key; the corpus total rides in as a broadcast 1-row
    * frame; scoring re-joins tokens to frequencies on the token key
    * (hash join, partial-aggregable final per-doc fold). Two shuffles
    * total, both on compact keys. A 100 TB deployment freezes the
    * frequency table once (it IS [[vocabulary]] without the cut) and
    * scores any stream against it with the join alone. */
  def lmUnigramScore(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val tk = df.select(col(idCol), explode(tokensOf(col(textCol))).as("w"))
    val freq = tk.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = tk.agg(count(lit(1)).as("nt"))
    tk.join(freq, Seq("w")).crossJoin(broadcast(total))
      .withColumn("ppm", expr("(cw * 1000000) DIV nt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(ppm) DIV count(1)").cast("long").as("score_ppm"))
  }
}
