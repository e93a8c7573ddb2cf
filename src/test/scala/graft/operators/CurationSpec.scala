package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("quality signals: exact integers on a known document") {
    val df = Seq((1L, "the cat sat on a mat!!")).toDF("id", "text")
    val r = Curation.qualitySignals(df, "text").head()
    assert(r.getAs[Int]("n_words") == 6)
    // non-space chars = 17, mean_wl_e2 = 1700 DIV 6 = 283
    assert(r.getAs[Long]("mean_wl_e2") == 283L)
    // 2 '!' of 22 chars -> 2000000 DIV 22 = 90909
    assert(r.getAs[Long]("symbol_e6") == 90909L)
    assert(r.getAs[Int]("stop_hits") == 2) // "the", "a"
  }

  test("quality rules: keep is the conjunction of the rule columns") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val bad = Curation.qualityRules(docs, "text")
      .filter(col("keep") =!= (col("r_words") && col("r_mean_wl") &&
        col("r_symbol") && col("r_stop")))
    assert(bad.count() == 0)
  }

  test("repetition: duplicate token and 2-gram fractions") {
    val df = Seq(
      (1L, "a b a b a"),    // toks 5 distinct 2 -> 600000; grams [a b, b a, a b, b a] -> 500000
      (2L, "x y z"),        // no dups
      (3L, "solo")          // single token: gram guard
    ).toDF("id", "text")
    val m = Curation.repetitionSignals(df, "text")
      .select("id", "dup_tok_e6", "dup_2gram_e6", "repetitive")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m(1L) == ((600000L, 500000L, true)))
    assert(m(2L) == ((0L, 0L, false)))
    assert(m(3L) == ((0L, 0L, false)))
  }

  test("decontaminate: flags only docs sharing a w-gram with the eval set") {
    val train = Seq(
      (1L, "one two three four five six"),   // shares "one two three four"
      (2L, "totally unrelated words here now")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "zzz one two three four"))
      .toDF("doc_id", "text")
    val rows = Curation.decontaminate(train, eval_, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 1 && rows.head._1 == 1L && rows.head._3 == 1L)
  }

  test("decontaminateExact: planted contamination found, zero false " +
    "negatives vs the brute-force contains join") {
    // synthetic corpus: every doc distinct; three PLANTED inclusions
    val mk = (i: Long) => s"document $i body " +
      (1 to 20).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")
    val planted = Map(
      5L -> "the quick brown fox jumps over the lazy dog tonight",
      17L -> "to be or not to be that is the question at hand here",
      23L -> "the quick brown fox jumps over the lazy dog tonight")
    val train = (1L to 40L).map(i =>
      (i, mk(i) + planted.get(i).map(" " + _).getOrElse("")))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "to be or not to be that is the question at hand here"),
      (102L, "this string appears in no training document anywhere"),
      (103L, "short snip")) // shorter than the window: lowers it
      .toDF("bench_id", "snippet")
    val got = Curation.decontaminateExact(train, bench,
      "doc_id", "text", "bench_id", "snippet")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 1L, 17L -> 1L, 23L -> 1L), got.toString)
    // ZERO FALSE NEGATIVES against brute force on a randomized corpus
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 300L).map { i =>
      val body = (1 to 30)
        .map(_ => s"t${rnd.nextInt(50)}").mkString(" ")
      // ~1 in 5 docs get a random bench snippet spliced mid-text
      val contaminated =
        if (rnd.nextInt(5) == 0)
          body.take(40) + " to be or not to be that is the question " +
            "at hand here " + body.drop(40)
        else body
      (i, contaminated)
    }.toDF("doc_id", "text")
    val fast = Curation.decontaminateExact(corpus, bench,
      "doc_id", "text", "bench_id", "snippet")
      .as[(Long, Long)].collect().toMap
    val brute = corpus.join(
        broadcast(bench.withColumnRenamed("snippet", "s")),
        col("text").contains(col("s")))
      .groupBy("doc_id").agg(countDistinct("bench_id").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fast == brute,
      s"fast=${fast.size} brute=${brute.size} — must be row-identical")
  }

  test("decontaminateExact on LONG documents: the Bloom screen passes " +
    "~only true hits, the re-check is an equi-join, answers exact") {
    // 400 documents of ~4,000 chars each (~1.5M windows total): the
    // round-11 16-bit/k=3 screen (0.5%/window FP) passed essentially
    // every such document; the 64-bit/k=6 screen must pass ~only the
    // planted ones
    val rnd = new scala.util.Random(7)
    def longDoc(): String =
      (1 to 800).map(_ => s"tok${rnd.nextInt(5000)}").mkString(" ")
    val snippets = (1 to 50).map(i =>
      (100L + i, s"unique benchmark passage number $i with some " +
        s"distinctive tail content ${i * 7919}"))
    val bench = snippets.toDF("bench_id", "snippet")
    val contaminatedIds = (1L to 400L).filter(_ % 40 == 0) // 10 docs
    val corpus = (1L to 400L).map { i =>
      val body = longDoc()
      val text = if (contaminatedIds.contains(i))
        body.take(2000) + " " + snippets((i % 50).toInt)._2 + " " +
          body.drop(2000)
      else body
      (i, text)
    }.toDF("doc_id", "text")
    val res = Curation.decontaminateExact(corpus, bench,
      "doc_id", "text", "bench_id", "snippet")
    // plan shape: the re-check must be a broadcast EQUI join on the
    // anchor hash, never a nested loop over survivors × benchmark
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the exact re-check must be an anchor equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    val got = res.as[(Long, Long)].collect().toMap
    assert(got.keySet == contaminatedIds.toSet &&
      got.values.forall(_ == 1L), got.toString)
    // the SCREEN itself passes ~only true hits: count docs with a
    // non-empty matched-anchor set at the production sizing
    val w = math.min(64, snippets.map(_._2.length).min)
    val anchors = snippets
      .map(s => graft.plans.Kernels.windowHash(s._2, w)).distinct.toArray
    val bitsLog2 = math.max(10,
      64 - java.lang.Long.numberOfLeadingZeros(
        anchors.length.toLong * 64L - 1L))
    val words = graft.plans.Kernels.bloomBuild(anchors, bitsLog2.toInt)
    val survivors = corpus.as[(Long, String)].collect().count { case (_, t) =>
      graft.plans.Kernels.rollingBloomAnchors(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), w, words)
        .numElements() > 0
    }
    assert(survivors >= contaminatedIds.size &&
      survivors <= contaminatedIds.size + 2,
      s"screen must pass ~only the ${contaminatedIds.size} true hits " +
        s"on a long-document corpus; passed $survivors")
  }

  test("pii redaction: counts and replacements on a known string") {
    val df = Seq((1L,
      "mail me at jane.doe+x@corp.example.org or +1-555-0099, ssn 987-65-4321 ok"))
      .toDF("id", "text")
    val r = Curation.redactPii(df, "text").head()
    assert(r.getAs[Int]("n_pii") == 3)
    val red = r.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
      red.contains("<SSN>"))
    assert(!red.contains("@") && !red.contains("555-0099") &&
      !red.contains("987-65-4321"))
  }

  test("mixture weights: exact e6 arithmetic toward a uniform token share") {
    val df = Seq(
      (1L, "a b c d", "web"), (2L, "e f", "web"),       // web: 6 tokens
      (3L, "g h i j k l m n o p q r", "code"))          // code: 12 tokens
      .toDF("doc_id", "text", "source")
    val rows = Curation.mixtureWeights(df, "source", "text")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("web") == ("web", 2L, 6L, 18L * 1000000 / (2 * 6)))   // 1.5e6: upsample
    assert(rows("code") == ("code", 1L, 12L, 18L * 1000000 / (2 * 12))) // 0.75e6: downsample
  }

  test("cluster representatives: best quality wins, id breaks ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L))
      .toDF("doc_id", "cluster")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L))
      .toDF("doc_id", "n_words")
    val reps = Dedup.clusterRepresentatives(clusters, "doc_id", "cluster",
      quality, "n_words").as[(Long, Long, Long, Long)].collect().toSet
    // cluster 1: docs 2 and 3 tie on quality 9 -> smallest id (2) wins
    assert(reps == Set((1L, 2L, 9L, 3L), (10L, 10L, 1L, 1L)))
  }

  test("common ngrams: counts, total order, and short-doc exclusion") {
    val df = Seq(
      (1L, "the quick fox jumps"), // "the quick fox", "quick fox jumps"
      (2L, "the quick fox"),
      (3L, "the quick fox the quick fox"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.commonNgrams(df, "doc_id", "text", n = 3, k = 2)
      .as[(String, Long, Long)].collect().toSeq
    // "the quick fox": 4 occurrences (doc3 has 2) across 3 docs
    assert(out.head == ("the quick fox", 4L, 3L))
    assert(out(1)._3 < 3L) // everything else is rarer
    assert(out.length == 2)
  }

  test("edit-distance pairs: exact levenshtein, relative threshold") {
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghiX"), // lev 1, 10% of 10
      (3L, "zzzzzzzzzz")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Curation.editDistancePairs(pairs, docs, "doc_id", "text", 50)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1))) // (1,3) is lev 10 = 100% > 50%
  }

  test("epoch shards: lossless partition, dense positions, epoch rotation") {
    val df = (1L to 400L).toDF("id")
    val e1 = Curation.epochShards(df, "id", 8, "e1")
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Int, Int)].collect()
    // lossless: every input row lands in exactly one shard
    assert(e1.map(_._1).sorted.toSeq == (1L to 400L))
    assert(e1.forall(r => r._2 >= 0 && r._2 < 8))
    // dense 1..|shard| positions inside each shard
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size))
    }
    // uniform-ish balance (400/8 = 50; md5 is uniform, loose 3x bound)
    assert(e1.groupBy(_._2).values.map(_.size).max < 150)
    // a different epoch re-permutes: same ids, different (shard, pos)
    val e2 = Curation.epochShards(df, "id", 8, "e2")
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Int, Int)].collect()
    assert(e1.toSet != e2.toSet, "epochs must produce distinct permutations")
    // determinism: replay is byte-identical
    val e1b = Curation.epochShards(df, "id", 8, "e1")
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Int, Int)].collect()
    assert(e1.toSet == e1b.toSet)
  }
}
