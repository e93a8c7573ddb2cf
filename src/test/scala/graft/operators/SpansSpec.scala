package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], k: Int, minDocs: Int = 2) =
    Spans.repeatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text",
        k, minDocs)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

  test("repeatedSpans: shared passage flagged in both hosts, merged") {
    // docs 1 and 2 share the 6-token passage; with k=3 that is four
    // overlapping shingles merging into ONE span of 6 tokens each side
    val shared = "x1 x2 x3 x4 x5 x6"
    val out = spans(Seq(
      (1L, s"a b $shared c d"),
      (2L, s"p $shared q r s"),
      (3L, "t u v w y z")), k = 3)
    assert(out(1L) == (1L, 6L))
    assert(out(2L) == (1L, 6L))
    assert(out(3L) == (0L, 0L))
  }

  test("repeatedSpans: two separated shared passages = two spans") {
    val out = spans(Seq(
      (1L, "s1 s2 s3 g1 g2 g3 g4 t1 t2 t3"),
      (2L, "s1 s2 s3 h1 h2 h3 h4 t1 t2 t3")), k = 3)
    // spans [1,3] and [8,10]: gap of 4 unflagged tokens > adjacency
    assert(out(1L) == (2L, 6L))
    assert(out(2L) == (2L, 6L))
  }

  test("repeatedSpans: adjacent flagged shingles merge, short docs safe") {
    val out = spans(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "xx"),              // shorter than k — no shingles
      (4L, "")), k = 5)
    // doc1/doc2: shingles at pos 1 and 2 overlap -> one span of 6
    assert(out(1L) == (1L, 6L))
    assert(out(2L) == (1L, 6L))
    assert(out(3L) == (0L, 0L))
    assert(out(4L) == (0L, 0L))
  }

  test("repeatedSpans: within-doc repetition alone is NOT flagged") {
    val out = spans(Seq(
      (1L, "r1 r2 r3 m n r1 r2 r3"),
      (2L, "unrelated words here entirely")), k = 3)
    assert(out(1L) == (0L, 0L)) // repeats only within doc 1; minDocs=2
  }

  test("repeatedSpans: hashed-shingle scale variant matches strings") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val s = Spans.repeatedSpans(docs, "doc_id", "text", 5, 2)
    val h = Spans.repeatedSpans(docs, "doc_id", "text", 5, 2,
      hashShingles = true)
    assert(s.except(h).count() == 0 && h.except(s).count() == 0)
  }

  test("repeatedSpans: minDocs threshold respected") {
    val rows = Seq(
      (1L, "c1 c2 c3 one"),
      (2L, "c1 c2 c3 two"),
      (3L, "c1 c2 c3 three"))
    assert(spans(rows, k = 3, minDocs = 4).forall(_._2 == (0L, 0L)))
    assert(spans(rows, k = 3, minDocs = 3).forall(_._2 == (1L, 3L)))
  }
}

class MixtureCapSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.Tables.load(spark, sfDir, "documents")

  test("mixtureSample: deterministic, rate-monotone, subset semantics") {
    val a = Curation.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 700000), 300000, "s").select("doc_id")
    val b = Curation.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 700000), 300000, "s").select("doc_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // raising every rate only ADDS rows (same hash, higher threshold)
    val wider = Curation.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 900000), 600000, "s").select("doc_id")
    assert(a.except(wider).count() == 0)
    assert(wider.count() > a.count())
    // ppm 1e6 keeps everything, 0 keeps nothing
    assert(Curation.mixtureSample(docs, "source", "doc_id",
      Map.empty, 1000000, "s").count() == docs.count())
    assert(Curation.mixtureSample(docs, "source", "doc_id",
      Map.empty, 0, "s").count() == 0)
  }

  test("domainCap: per-group cap holds and matches the window oracle") {
    val capped = Curation.domainCap(docs, "source", "doc_id", 3, "c")
    val sizes = capped.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) <= 3))
    // oracle: row_number over the same salted-hash priority
    val pri = graft.functions.StableHash.stable32(
      concat(col("doc_id").cast("string"), lit("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(pri, col("doc_id"))
    val oracle = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("doc_id")
    assert(capped.select("doc_id").except(oracle).count() == 0)
    assert(oracle.except(capped.select("doc_id")).count() == 0)
  }

  test("mixtureResample: copy counts follow the integer + fraction split") {
    val out = Curation.mixtureResample(docs, "source", "doc_id",
      Map("src0" -> 2500000), 1000000, "r")
    val per = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
    // copies are a dense 0..n-1 index
    assert(per.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count() == 0)
    // src0 rows appear 2 or 3 times; all other rows exactly once
    assert(per.filter(col("source") === "src0" &&
      !col("n").isin(2L, 3L)).count() == 0)
    assert(per.filter(col("source") =!= "src0" && col("n") =!= 1L)
      .count() == 0)
    // fractional share: some src0 row got 2 and some got 3 copies
    val ns = per.filter(col("source") === "src0")
      .select("n").distinct().as[Long].collect().toSet
    assert(ns == Set(2L, 3L))
    // rate 0 drops the group entirely
    assert(Curation.mixtureResample(docs, "source", "doc_id",
      Map("src0" -> 0), 1000000, "r")
      .filter(col("source") === "src0").count() == 0)
  }

  test("domainCap: groups smaller than the cap pass through whole") {
    val small = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"))
      .toDF("doc_id", "source")
    assert(Curation.domainCap(small, "source", "doc_id", 5, "c")
      .count() == 3)
  }
}
