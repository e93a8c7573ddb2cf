package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** Byte-pair-encoding tokenizer training and application — the
  * canonical tokenizer-training workload of an LLM data pipeline
  * (Sennrich et al. 2016), distributed the way production trainers
  * distribute it.
  *
  * Scale shape: the corpus (100 TB) collapses to the DISTINCT-WORD
  * count table in ONE shuffle — Zipf makes that table tiny relative to
  * the corpus (~1e8 rows for web scale) — and the merge loop then runs
  * entirely on the word table: each round is one flatMap over word
  * symbol arrays + one map-side-combined reduceByKey of pair counts +
  * one treeReduce to pick the argmax pair (driver state: ONE pair per
  * round), then a narrow map rewrites the words. Nothing in the loop
  * touches the corpus again, no round shuffles more than the distinct
  * pair counts, and lineage is truncated periodically so round K's
  * plan stays O(1).
  *
  * Semantics (identical on both engines, pinned by the oracle):
  * words are whitespace-split lowercase tokens; initial symbols are
  * the word's code points (no end-of-word marker — word-internal BPE,
  * GPT-2 pretokenizer style); each training round counts every
  * adjacent symbol pair occurrence (so "aaa" contributes (a,a) twice),
  * picks the highest-count pair with ascending (left, right) as the
  * tiebreak, and merges its occurrences leftmost-first; application
  * replays merges by repeatedly merging the LEFTMOST occurrence of the
  * LOWEST-RANK applicable pair until none applies.
  */
object Bpe {

  case class Merge(rank: Int, left: String, right: String, count: Long)

  private def codePoints(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Merge every occurrence of (l, r), leftmost-first non-overlapping. */
  private def mergeAll(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** The distinct-word count table: ONE corpus shuffle; everything
    * after runs on this. */
  private def wordCounts(docs: DataFrame, textCol: String): RDD[(Array[String], Long)] =
    docs.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .queryExecution.toRdd
      .map(ir => (codePoints(ir.getUTF8String(0).toString), ir.getLong(1)))

  /** Learn `numMerges` merge rules. Stops early when no pair reaches
    * `minCount`. Output: (rank, left, right, pair_count) ordered by
    * rank — `pair_count` is the pair's corpus count at merge time. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wordCounts(docs, textCol).persist(lvl)
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // ((l, r), count): map-side combined; treeReduce leaves O(1)
      // driver state — never a full pair-table collect
      val best = words
        .flatMap { case (syms, c) =>
          var i = 0
          val it = new scala.collection.mutable.ArrayBuffer[((String, String), Long)](
            math.max(syms.length - 1, 0))
          while (i + 1 < syms.length) {
            it += (((syms(i), syms(i + 1)), c))
            i += 1
          }
          it
        }
        .reduceByKey(_ + _)
        .map { case ((l, r), c) => (c, l, r) }
        .fold((0L, "", "")) { (a, b) =>
          // max by (count, then ASCENDING (l, r)): deterministic
          if (b._1 > a._1 ||
            (b._1 == a._1 && (a._2 == "" ||
              (b._2 < a._2 || (b._2 == a._2 && b._3 < a._3))))) b else a
        }
      if (best._1 < minCount) done = true
      else {
        val (c, l, r) = best
        merges += Merge(rank, l, r, c)
        val prev = words
        words = prev.map { case (syms, wc) => (mergeAll(syms, l, r), wc) }
          .persist(lvl)
        // truncate the map-chain lineage periodically; the word table
        // is O(distinct words), cheap to checkpoint locally
        if (rank % 8 == 0) { words = words.localCheckpoint() }
        words.count()
        prev.unpersist(blocking = false)
        rank += 1
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq
  }

  /** [[train]] as a DataFrame (the q_bpe_train surface). */
  def trainDf(docs: DataFrame, textCol: String, numMerges: Int,
              minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val rows = train(docs, textCol, numMerges, minCount)
      .map(m => Row(m.rank, m.left, m.right, m.count))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Tokenize one word under the learned ranks: repeatedly merge the
    * LEFTMOST occurrence of the LOWEST-rank applicable pair. */
  private[operators] def applyWord(word: String,
                                   ranks: Map[(String, String), Int]): Array[String] = {
    var syms = codePoints(word)
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < bestRank => bestRank = rk; bestPos = i
          case _ =>
        }
        i += 1
      }
      if (bestPos < 0) go = false
      else {
        val merged = syms(bestPos) + syms(bestPos + 1)
        syms = (syms.take(bestPos) :+ merged) ++ syms.drop(bestPos + 2)
      }
    }
    syms
  }

  /** Apply learned merges to a corpus: per doc, (n_tokens,
    * n_merged — tokens longer than one code point, i.e. produced by at
    * least one merge — and the md5 of the space-joined token stream —
    * one mis-merged word anywhere fails the hash). Narrow map over the
    * corpus; the merge table is broadcast (numMerges entries). */
  def applyDf(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        val rk = ranks.value
        it.map { case (id, text) =>
          val tokens = text.toLowerCase.split(" ").iterator
            .filter(_.nonEmpty)
            .flatMap(w => applyWord(w, rk))
            .toArray
          val joined = tokens.mkString(" ")
          digest.reset()
          val md5hex = digest.digest(joined.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          (id, tokens.length,
            tokens.count(t => t.codePointCount(0, t.length) > 1), md5hex)
        }
      }
      .toDF(idCol, "n_tokens", "n_merged", "tokens_md5")
  }
}
