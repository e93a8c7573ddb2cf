package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication: find k-token word spans that
  * recur across documents and merge their occurrences into maximal
  * per-document intervals — the signal a curation pipeline uses to
  * strip boilerplate passages that doc-level near-dup (simhash /
  * minhash over whole documents) cannot see, because the documents
  * hosting a shared paragraph are otherwise different.
  *
  * Reference scope: carlossegovia/scala-etl-test has no text-curation
  * tier; this extends the engine for LLM training-data work (the
  * ExactSubstr idea of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", 2022 — re-expressed at token-shingle
  * granularity as relational operators instead of a suffix array).
  */
object Spans {

  /** Per-document repeated-span profile: `(id, n_spans,
    * repeated_tokens)` for every input document, where spans are
    * maximal merged intervals of k-token shingles that occur in at
    * least `minDocs` DISTINCT documents. Overlapping or directly
    * adjacent flagged shingles merge into one span (an interval
    * [pos, pos+k-1] merges into the previous one when its start is
    * within prevEnd + 1).
    *
    * Scale shape: the shingle exchange is the cost — O(tokens) rows
    * shuffled once to count document frequency, partial-aggregated on
    * the shingle key, then a semi join back onto positions and ONE
    * per-document window (keyed by doc id, partial interval state).
    * At 100 TB, set `hashShingles=true` so the exchange ships
    * fixed-width 64-bit keys instead of k-word strings (collision
    * risk bounded by corpus shingle count; the gate keeps raw strings
    * so the DuckDB oracle can reproduce counts exactly).
    * Within-document repetition is deliberately out of scope here —
    * `Curation.repetitionSignals` covers it.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int, minDocs: Int,
                    hashShingles: Boolean = false): DataFrame = {
    require(k >= 1 && minDocs >= 1, "k and minDocs must be positive")
    val toks = split(col(textCol), " ")
    // positions are 1-based; guard short docs — sequence(1, n) with
    // n <= 0 would step BACKWARDS (sequence infers step -1), not empty
    val shingleStrs = when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    // hashShingles: the CLUSTER configuration — the DF exchange ships
    // an 8-byte xxhash64 key per shingle instead of the k-word string
    // (~50x narrower at k=5). A collision can only over-merge two
    // shingles' doc sets (flagging at most k extra tokens); expected
    // collisions ~ m^2 / 2^65 for m distinct shingles — negligible
    // until m approaches 2^32. Measured single-node it is ~20% SLOWER
    // (hashing is extra CPU and a local shuffle never leaves the
    // memory bus — PERF.md round-5); the trade wins once shuffle
    // crosses a network. The gate keeps raw strings so the DuckDB
    // oracle reproduces counts exactly.
    val shingles = if (hashShingles)
      transform(shingleStrs, s => xxhash64(s)) else shingleStrs
    val posShingle = df
      .select(col(idCol).as("doc_id"), posexplode(shingles).as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("sh"))
    // corpus document frequency per shingle: distinct (sh, doc) first so
    // the count is partial-aggregable without count(distinct) rewrite
    val repeated = posShingle.select(col("sh"), col("doc_id")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("sh"))
    val flagged = posShingle.join(repeated, Seq("sh"), "left_semi")
    // island merge: a flagged shingle starts a new span iff it begins
    // after prevEnd + 1 (prevEnd = maxPrevPos + k - 1)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val prevMax = max(col("pos")).over(wPrev)
    val grouped = flagged
      .withColumn("ni", when(prevMax.isNull || col("pos") > prevMax + k,
        lit(1)).otherwise(lit(0)))
      .withColumn("g", sum(col("ni")).over(wRun))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    val perDoc = grouped.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("repeated_tokens"))
      .withColumnRenamed("doc_id", "__span_doc")
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("__span_doc"), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("repeated_tokens"), lit(0L)).as("repeated_tokens"))
  }
}
