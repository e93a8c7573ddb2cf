package graft.operators

import graft.SparkSpec

/** BPE training vs a driver-side reference implementation of the same
  * contract (adjacency-counted pairs, max count with ascending-pair
  * tiebreak, leftmost-nonoverlapping merge), plus apply semantics. The
  * corpus-level apply correctness is hash-gated by q_bpe_apply's
  * recursive-CTE oracle; these specs pin the TRAIN side, which the
  * gate cannot see (the oracle replays learned merges, it does not
  * re-learn them). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def refTrain(texts: Seq[String], k: Int,
                       minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view
      .mapValues(_.size.toLong)
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .toMap
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty || counts.values.max < minCount) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, c))
        words = words.toSeq.map { case (syms, wc) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += l + r; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> wc
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        rank += 1
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the bat and the cat", "banana bandana",
    "low lower lowest", "new newer newest", "wider wide widest",
    "the the the and and a", "cats bats mats", "banana banana")

  test("train == driver reference, merge by merge") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 20)
      .map(m => (m.rank, m.left, m.right, m.count))
    assert(got == refTrain(corpus, 20))
    assert(got.nonEmpty)
    // and deterministic across invocations (commutative argmax fold)
    val again = Bpe.train(docs, "text", 20)
      .map(m => (m.rank, m.left, m.right, m.count))
    assert(again == got)
  }

  test("train stops early when no pair reaches minCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", 10).isEmpty) // every pair count 1
    val docs2 = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val m = Bpe.train(docs2, "text", 10)
    assert(m.map(t => (t.left, t.right, t.count)).headOption
      .contains(("a", "b", 2L)))
  }

  test("applyWord: leftmost occurrence of lowest-rank pair, repeatedly") {
    val ranks = Map(("a", "b") -> 1, ("a", "a") -> 2,
      ("ab", "ab") -> 3, ("n", "a") -> 4)
    // same cases the DuckDB oracle prototype was verified on
    assert(Bpe.applyWord("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(Bpe.applyWord("bab", ranks).toSeq == Seq("b", "ab"))
    assert(Bpe.applyWord("abab", ranks).toSeq == Seq("abab"))
    assert(Bpe.applyWord("banana", ranks).toSeq == Seq("b", "a", "na", "na"))
    assert(Bpe.applyWord("x", ranks).toSeq == Seq("x"))
  }

  test("applyDf: tokens partition each word; merged-token count is exact") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 15)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = Bpe.applyDf(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      val tokens = text.toLowerCase.split(" ").filter(_.nonEmpty)
        .flatMap(w => Bpe.applyWord(w, ranks))
      // tokenization must reconstruct the text exactly
      assert(tokens.mkString("") ==
        text.toLowerCase.split(" ").filter(_.nonEmpty).mkString(""))
      val (n, nm, md5) = got(i.toLong)
      assert(n == tokens.length, s"doc $i")
      assert(nm == tokens.count(_.length > 1), s"doc $i")
      val digest = java.security.MessageDigest.getInstance("MD5")
      assert(md5 == digest.digest(tokens.mkString(" ").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString, s"doc $i")
    }
  }
}
