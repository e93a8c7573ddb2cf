package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary: top-V by count with count-desc/token-asc rank") {
    val df = Seq("b b b a a c", "a d", "e e").toDF("text")
    val v = TextAnalysis.vocabulary(df, "text", 3)
      .as[(String, Long, Int)].collect().toList
    // counts: a=3, b=3, e=2, c=1, d=1 — tie a/b broken by token asc
    assert(v == List(("a", 3L, 1), ("b", 3L, 2), ("e", 2L, 3)))
  }

  test("oovStats: exact counts and e6 rate, all-OOV and all-in-vocab docs") {
    val docs = Seq((1L, "a b oov1"), (2L, "oov2 oov3"), (3L, "a a"))
      .toDF("doc_id", "text")
    val vocab = Seq(("a", 1L, 1), ("b", 2L, 2)).toDF("token", "cnt", "rank")
    val out = TextAnalysis.oovStats(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 1L, 333333L)))
    assert(out(2L) == ((2L, 2L, 1000000L)))
    assert(out(3L) == ((2L, 0L, 0L)))
  }

  test("tfidfTopTerms: rare terms outrank common ones; k and ties respected") {
    // "common" appears in every doc; each doc has one unique term
    val docs = Seq(
      (1L, "common unique1 unique1 common"),
      (2L, "common unique2"),
      (3L, "common unique3 unique3 unique3")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .orderBy($"doc_id", $"rnk")
      .as[(Long, String, Long, Long, Int)].collect().toSeq

    // n_docs=3, df(common)=3, df(unique_i)=1
    // score(unique1 in d1) = 2*1e6*3/1 = 6e6; score(common in d1) = 2*1e6*3/3 = 2e6
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._4)) ==
      Seq(("unique1", 6000000L), ("common", 2000000L)))
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._4)) ==
      Seq(("unique2", 3000000L), ("common", 1000000L)))
    assert(out.filter(_._1 == 3L).map(_._2) == Seq("unique3", "common"))
    // exactly k rows per doc, ranks 1..k
    assert(out.groupBy(_._1).forall(_._2.map(_._5).sorted == Seq(1, 2)))
  }

  test("tfidf scoring is exact integer (score_e6 = tf*1e6*n DIV df)") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3)
      .as[(Long, String, Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(out((1L, "a")) == 2L * 1000000 * 2 / 1)
    assert(out((1L, "b")) == 1L * 1000000 * 2 / 2)
    assert(out((2L, "c")) == 1L * 1000000 * 2 / 1)
  }

  test("collocations: exact PMI ratio, minCount cut, deterministic order") {
    // corpus: "x y" ×3 (tight pair), "a b" ×3 with a,b also frequent
    // standalone — PMI(x,y) should beat PMI(a,b).
    val docs = Seq(
      "x y", "x y", "x y",
      "a b", "a b", "a b",
      "a c", "a d", "b e", "b f"
    ).toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 3L, topK = 10)
      .as[(String, String, Long, Long)].collect().toList
    // N = 20 tokens; c(x)=c(y)=3, c(x,y)=3 → 3*20*1e6/(3*3) = 6666666
    // c(a)=c(b)=5, c(a,b)=3 → 3*20*1e6/25 = 2400000
    assert(out == List(
      ("x", "y", 3L, 6666666L),
      ("a", "b", 3L, 2400000L)))
  }

  test("collocations: single-token and empty docs contribute no bigrams") {
    val docs = Seq("solo", "", "p q", "p q", "p q").toDF("text")
    val out = TextAnalysis.collocations(docs, "text", 3L, 5)
      .as[(String, String, Long, Long)].collect().toList
    // split("", " ") = [""] — the empty doc contributes one empty token.
    // N = 8 tokens (solo + "" + 3×2); c(p)=c(q)=3 → 3*8*1e6/9 = 2666666
    assert(out == List(("p", "q", 3L, 2666666L)))
  }

  test("bm25: rare term outranks common at equal tf/dl; tf saturates") {
    val docs = Seq(
      (1L, "rare x x x"),    // rare term, dl=4
      (2L, "common x x x"),  // common term, dl=4
      (3L, "common y y y"),
      (4L, "common z z z"),
      (5L, "rare rare rare x") // tf=3 of rare, dl=4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
      Seq("rare", "common"), 5).as[(Long, Long, Long)].collect().toList
    val score = out.map(r => r._1 -> r._2).toMap
    // df(rare)=2 < df(common)=3 → at equal tf and dl, rare scores higher
    assert(score(1L) > score(2L))
    // saturation: tf=3 scores more than tf=1 but far less than 3×
    assert(score(5L) > score(1L) && score(5L) < 3 * score(1L))
    // every returned doc matched exactly one query term
    assert(out.forall(_._3 == 1L))
    // deterministic ordering: scores descending, then id
    assert(out.map(r => (-r._2, r._1)) == out.map(r => (-r._2, r._1)).sorted)
  }

  test("ngramLmCounts: continuation counts over ALL bigram types") {
    // bigrams: (a b)×3, (c b)×1, (b d)×1 — left_types(b)=2 even though
    // (c b) is below minCount; right_types(a)=1; c(a)=3, c(b)=5
    val docs = Seq("a b", "a b", "a b", "c b", "b d").toDF("text")
    val out = TextAnalysis.ngramLmCounts(docs, "text", minCount = 2L, topK = 5)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(("a", "b", 3L, 3L, 5L, 2L, 1L)))
  }
}
