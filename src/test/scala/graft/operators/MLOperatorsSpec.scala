package graft.operators

import graft.SparkSpec
import graft.functions.StableHash
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps min id and counts duplicates") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val out = Dedup.exact(df, Seq("text"), "id")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("x", 1L, 2L), ("y", 3L, 1L)))
  }

  test("minhash signatures identical for identical texts, and near-dups collide in LSH") {
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val nearDup = near + " ok" // high shingle overlap
    val other = "completely different content with nothing shared at all here"
    val df = Seq((1L, near), (2L, near), (3L, nearDup), (4L, other))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 5, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(2L), "identical docs must have identical signatures")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text", 5, 8, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dups must be candidates")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      "near-dup should collide in at least one band")
    assert(!pairs.contains((1L, 4L)), "unrelated docs should not collide")
  }

  test("hot-bucket cap drops only pairs whose every shared bucket is hot") {
    // constructed corpus: 20 identical "boilerplate" clones (they share
    // ALL buckets, so each of their buckets has >= 20 members) plus one
    // isolated near-dup pair in cold buckets of size 2
    val boiler = "common boilerplate license header text repeated verbatim on every page"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1L to 20L).map(i => (i, boiler)) ++
      Seq((100L, near), (101L, near + " ok")))
      .toDF("doc_id", "text")
    // k=8/bands=4 (r=2): the same parameters the LSH collision test
    // above already proves collide for this exact near-dup text pair
    val all = Dedup.minhashCandidates(docs, "doc_id", "text", 5, 8, 4)
      .as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashCandidates(docs, "doc_id", "text", 5, 8, 4,
        maxBucketSize = Some(10))
      .as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(all), "cap must only remove pairs")
    assert(all.contains((1L, 2L)), "uncapped finds the clone pairs")
    // clone pairs live ONLY in hot buckets (>= 20 > 10) -> dropped
    assert(!capped.exists { case (a, b) => a <= 20 && b <= 20 },
      s"hot-bucket pairs must be dropped, got $capped")
    // the cold-bucket near-dup pair survives the cap
    assert(capped.contains((100L, 101L)), s"cold pair must survive, got $capped")
  }

  test("jaccardPrefixJoin == brute-force all-pairs at every threshold") {
    val rnd = new scala.util.Random(29)
    val vocab = (0 until 40).map(i => s"tok$i")
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // planted near-dups: 30/31 clone 0/1 with one word changed
    val docs = (base ++ Seq(
      (30L, base(0)._2.replaceFirst("\\w+", "changed")),
      (31L, base(1)._2))).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val viaPrefix = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 3, t)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
      val brute = Dedup.ngramJaccardPairs(
          docs.withColumn("blk", lit(1)), "doc_id", "text", "blk",
          3, t, wordGrams = true)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
      assert(viaPrefix == brute,
        s"t=$t missing=${brute -- viaPrefix} extra=${viaPrefix -- brute}")
    }
    // the exact clone must always be found
    val out = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 3, 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.exists(r => r._1 == 1L && r._2 == 31L && r._3 == 1.0))
  }

  test("fused MinhashSignature expression equals the HOF formulation") {
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((1L, "the quick brown fox"), (2L, "zzz"), (3L, "abcde"))
      .toDF("doc_id", "text")
    val xs = transform(
      array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
        i => col("text").substr(i, lit(5)))),
      s => StableHash.stable32(s))
    val viaHof = df.select(col("doc_id") +:
      (0 until 8).map(i =>
        array_min(transform(xs, x => StableHash.universal(x, i))).as(s"mh$i")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val viaExpr = Dedup.minhashSignatures(df, "doc_id", "text", 5, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(viaExpr == viaHof)
  }

  test("minLabelClusters: components get min-id labels, keepers flagged") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3, pair 5-6, isolated 4
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.minLabelClusters(ids, "doc_id", pairs, "id_a", "id_b",
        rounds = 3)
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      4L -> (4L, true), 5L -> (5L, true), 6L -> (5L, false)))
  }

  test("property: minLabelClusters == union-find components on a random graph") {
    val rnd = new scala.util.Random(11)
    val n = 80
    val edges = (1 to 100).map(_ =>
      (rnd.nextLong(n) + 1, rnd.nextLong(n) + 1)).filter(e => e._1 != e._2)
    // driver-side union-find oracle
    val parent = Array.tabulate(n + 1)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val oracle = (1 to n).map { i =>
      i.toLong -> (1 to n).filter(j => find(j) == find(i)).min.toLong
    }.toMap
    // rounds to convergence, simulated driver-side (keeps the iterative
    // join lineage short instead of worst-casing rounds = n)
    val adj = edges.flatMap(e => Seq(e._1.toInt -> e._2.toInt,
      e._2.toInt -> e._1.toInt)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = Array.tabulate(n + 1)(identity)
    var rounds = 0
    var changed = true
    while (changed) {
      val next = lbl.clone()
      for (i <- 1 to n; j <- adj.getOrElse(i, Nil)) {
        if (lbl(j) < next(i)) next(i) = lbl(j)
      }
      changed = !next.sameElements(lbl)
      lbl = next
      if (changed) rounds += 1
    }
    val ids = (1 to n).map(_.toLong).toDF("doc_id")
    val out = Dedup.minLabelClusters(ids, "doc_id",
        edges.toDF("id_a", "id_b"), "id_a", "id_b", rounds = rounds)
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(t => t._1 -> t._2).toMap == oracle)
    assert(out.forall(t => t._3 == (t._1 == t._2))) // keeper flag
  }

  test("fuzzyJoin: cross-corpus duplicates found, disjoint texts absent") {
    val sharedA = "the quick brown fox jumps over the lazy dog again and again"
    val sharedB = sharedA + " ok" // near-dup of sharedA
    val left = Seq((10L, sharedA),
      (11L, "left only content that matches nothing on the other side"))
      .toDF("doc_id", "text")
    val right = Seq((20L, sharedA), (21L, sharedB),
      (22L, "right side text entirely unrelated to anything in left"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyJoin(left, right, "doc_id", "text",
        n = 5, k = 8, bands = 4, w = 3, minJaccard = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(out.contains((10L, 20L)), "exact cross-corpus dup must match")
    assert(!out.exists(p => p._1 == 11L || p._2 == 22L),
      s"unrelated docs must not pair: $out")
    // never pairs within one corpus: all outputs are (left, right)
    assert(out.forall(p => p._1 < 20L && p._2 >= 20L))
  }

  test("fuzzyJoin: hot-bucket cap bounds candidates from boilerplate left rows") {
    val boiler = "identical boilerplate text repeated across every left document"
    val left = (0L until 10L).map(i => (i, boiler)).toDF("doc_id", "text")
    val right = Seq((100L, boiler)).toDF("doc_id", "text")
    val uncapped = Dedup.fuzzyJoin(left, right, "doc_id", "text",
      minJaccard = 0.9).count()
    val capped = Dedup.fuzzyJoin(left, right, "doc_id", "text",
      minJaccard = 0.9, maxBucketSize = Some(5)).count()
    assert(uncapped == 10L)
    assert(capped == 0L, "a 10-deep left bucket must be dropped at cap 5")
  }

  test("ngram jaccard: identical=1.0, disjoint pairs absent") {
    val df = Seq((1L, "aaaaabbbbb", "g"), (2L, "aaaaabbbbb", "g"),
      (3L, "zzzzzyyyyy", "g")).toDF("doc_id", "text", "blk")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", "blk", 5, 0.0)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(!out.contains((1L, 3L)))
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " lambda" // one extra token
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val out = Dedup.simhash32(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    val dist = java.lang.Long.bitCount(out(1L) ^ out(3L))
    assert(dist <= 8, s"near-dup hamming distance $dist too large")
  }

  test("simhash rotation: recall 1 vs naive all-pairs for hamming < blocks (sf0.001)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val maxH = 8
    // pigeonhole guarantee needs blocks > maxHamming: 16 blocks of 2
    // bits cover h <= 15 — every hamming<=8 pair must surface
    val naive = {
      val sigs = Dedup.simhash32(docs, "doc_id", "text")
        .as[(Long, Long)].collect()
      (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia, ib, h)).toSet
    }
    val rotated = Dedup.simhashPairs(docs, "doc_id", "text", maxH, blocks = 16)
      .as[(Long, Long, Int)].collect().toSet
    assert(rotated == naive,
      s"missed=${(naive -- rotated).take(3)} extra=${(rotated -- naive).take(3)}")
    // the scale default (4 blocks, guarantee h<=3) must still find every
    // pair within its guaranteed radius, and emit no false pairs
    val rotated4 = Dedup.simhashPairs(docs, "doc_id", "text", maxH)
      .as[(Long, Long, Int)].collect().toSet
    assert(rotated4.subsetOf(naive))
    assert(naive.filter(_._3 < 4).subsetOf(rotated4),
      "a hamming<4 pair escaped the 4-block rotation")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("bruteTopK: planted duplicate is always rank 1 with cos ~ 1") {
    val base = vecs(7, 20, 16)
    // plant: vec 19 := vec 0 (+ tiny noise via exact copy here)
    val planted = base.updated(19, (19L, base(0)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(df, df.filter($"vec_id" === 0),
        "vec_id", "embedding", 3)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.head._2 == 19L, s"expected planted dup first, got ${out.toSeq}")
    assert(math.abs(out.head._4 - 1.0) < 1e-4)
  }

  test("SRP-blocked near-dup: subset of exact, recall 1 on planted duplicates") {
    val dim = 64
    val base = vecs(11, 60, dim)
    // plant 10 exact duplicates: ids 60..69 clone ids 0..9. θ=0 pairs
    // share EVERY bucket, so the blocked variant must always find them.
    val planted = base ++ (0 until 10).map(i => (60L + i, base(i)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Similarity.nearDupPairsBlocked(df, "vec_id", "embedding",
        dim, 0.3, planes = 6, tables = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked.subsetOf(exact),
      s"false pairs: ${(blocked -- exact).take(3)}")
    val plantedPairs = (0 until 10).map(i => (i.toLong, 60L + i)).toSet
    assert(plantedPairs.forall(p => blocked.exists(t => (t._1, t._2) == p)),
      s"missed planted duplicates: ${plantedPairs.filterNot(p => blocked.exists(t => (t._1, t._2) == p))}")
    // measured recall over ALL exact pairs at this threshold, logged for
    // the operator's doc contract (deterministic given seed + planes)
    val recall = if (exact.isEmpty) 1.0 else blocked.size.toDouble / exact.size
    info(f"blocked recall at cos>=0.3: $recall%.3f (${blocked.size}/${exact.size})")
  }

  test("native TopKAgg variant is row-identical to the window variant") {
    val df = vecs(23, 40, 16).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 4)
    val viaWindow = Similarity.bruteTopK(df, q, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    val viaAgg = Similarity.bruteTopKAgg(df, q, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
  }

  test("lshBucketTopK finds planted duplicate (same bucket by construction)") {
    val base = vecs(11, 50, 16)
    val planted = base.updated(49, (49L, base(1)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")
    val out = Similarity.lshBucketTopK(df, df.filter($"vec_id" === 1),
        "vec_id", "embedding", dim = 16, k = 3, planes = 6)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.exists(r => r._2 == 49L && r._3 == 1),
      s"planted dup must share every SRP bucket: ${out.toSeq}")
  }

  test("kmeans recovers well-separated blobs; IVF finds the planted dup") {
    val rnd = new scala.util.Random(31)
    // three tight blobs around distant centers
    val centers = Seq(Array.fill(16)(5f), Array.fill(16)(-5f),
      Array.tabulate(16)(i => if (i % 2 == 0) 5f else -5f))
    val pts = (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => v + rnd.nextGaussian().toFloat * 0.1f))
    }
    // plant: 59 := copy of 0
    val planted = pts.updated(59, (59L, pts(0)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")

    val prepared = KMeans.prepare(df, "vec_id", "embedding")
    val cents = KMeans.fit(prepared, 3, 4)
    val assign = prepared.withColumn("c",
        KMeans.nearestCentroid(col("v"), col("n2"), cents))
      .select("id", "c").as[(Long, Int)].collect().toMap
    // blob membership must be consistent: same blob -> same cluster
    for (blob <- 0 until 3) {
      val ids = (0 until 59).filter(_ % 3 == blob).map(_.toLong)
      assert(ids.map(assign).toSet.size == 1, s"blob $blob split: ${ids.map(assign).toSet}")
    }

    val out = KMeans.ivfTopK(df, df.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 3, clusters = 3, iters = 3, nprobe = 1)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.head._2 == 59L, s"planted dup must rank 1: ${out.toSeq}")
    assert(math.abs(out.head._4 - 1.0) < 1e-4)
  }

  test("nearDupPairs finds only the planted pair at high threshold") {
    val base = vecs(13, 30, 16)
    val planted = base.updated(29, (29L, base(2)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((2L, 29L)))
  }

  test("negativeSamples: never same-label, deterministic, k probes per anchor") {
    val rows = (0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "label")
    val out = Similarity.negativeSamples(rows, "id", "label", k = 4,
        slots = 16, salt = "t")
      .as[(Long, Int, Long, Int)].collect()
    val labelOf = (0 until 60).map(i => i.toLong -> i % 3).toMap
    out.foreach { case (a, _, n, nl) =>
      assert(labelOf(n) == nl && nl != labelOf(a),
        s"negative $n shares anchor $a's label")
    }
    // at most k negatives per anchor; a probe whose slot holds no
    // other-label representative emits nothing (documented semantics),
    // so counts may dip below k — but never to zero here, and most
    // anchors fill all k probes
    val perAnchor = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perAnchor.size == 60 && perAnchor.values.forall(n => n >= 1 && n <= 4))
    assert(perAnchor.values.count(_ == 4) >= 45,
      s"too many starved probes: ${perAnchor.count(_._2 != 4)} anchors short")
    // re-run identical
    val again = Similarity.negativeSamples(rows, "id", "label", k = 4,
        slots = 16, salt = "t")
      .as[(Long, Int, Long, Int)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("semDedup matches a driver-local within-cell recompute; keepers kept") {
    val dim = 16
    val base = vecs(41, 50, dim)
    // plant exact duplicates: 50..54 clone 0..4 (same cell by construction)
    val planted = base ++ (0 until 5).map(i => (50L + i, base(i)._2.clone()))
    val df = planted.toDF("vec_id", "embedding")
    val cents = KMeans.fitOn(df, "vec_id", "embedding", 4, 3)
    val out = Similarity.semDedup(cents, df, "vec_id", "embedding", 0.3)
      .as[(Long, Int, Boolean)].collect()
    assert(out.length == planted.size)

    // driver-local oracle in the SAME fixed-point arithmetic
    val fixed = planted.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * Similarity.Scale))
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cell(v: Array[Long]): Int = {
      val n2 = dot(v, v)
      val d = cents.map(c => n2 - 2 * dot(v, c) + dot(c, c))
      d.indexOf(d.min)
    }
    val cellOf = fixed.map { case (id, v) => id -> cell(v) }
    val expectDup = fixed.keys.map { id =>
      id -> fixed.keys.exists { other =>
        other < id && cellOf(other) == cellOf(id) && {
          val (a, b) = (fixed(other), fixed(id))
          dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble) >= 0.3
        }
      }
    }.toMap
    out.foreach { case (id, c, isDup) =>
      assert(c == cellOf(id), s"cell mismatch for $id")
      assert(isDup == expectDup(id), s"flag mismatch for $id")
    }
    // every planted clone is flagged; each keeper (lower id) group survives
    (0 until 5).foreach { i =>
      assert(out.find(_._1 == 50L + i).get._3, s"planted clone ${50 + i} not flagged")
    }
    assert(out.count(!_._3) >= 1)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText: NFC composes, case folds, whitespace collapses") {
    val rows = Seq(
      (1L, "Café   du\tMonde "),   // decomposed e + acute
      (2L, "Café du Monde"),        // precomposed
      (3L, "  A\n\nB  "),
      (4L, ""))
      .toDF("id", "raw")
    val out = rows.select($"id",
        TextAnalysis.normalizeText($"raw").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "café du monde")
    assert(out(1L) == out(2L)) // decomposed == composed after the ladder
    assert(out(3L) == "a b")
    assert(out(4L) == "")
    // kernel == driver-local java.text.Normalizer on the same input
    val viaJava = java.text.Normalizer
      .normalize("Café", java.text.Normalizer.Form.NFC).toLowerCase
    assert(out(1L).startsWith(viaJava))
  }

  test("wordpiece kernel: greedy maximal munch, reconstruction, unk") {
    import graft.plans.Kernels
    def wp(s: String): String =
      Kernels.wordpiece(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toString
    // greedy longest match: "the" is a vocab trigram, taken whole;
    // "theory" = the + or + y (maximal munch at each position)
    assert(wp("the") == "the")
    assert(wp("theory") == "the or y")
    // unknown char emits <unk> and advances one
    assert(wp("a!b") == "a <unk> b")
    // case folded; words processed independently; empties skipped
    assert(wp("The  THE") == "the the")
    assert(wp("") == "")
    // reconstruction: joining non-unk pieces re-yields the word's
    // matched characters in order
    val pieces = wp("information").split(" ")
    assert(pieces.mkString("") == "information")
    // every piece is in the vocabulary (or <unk>)
    val vocab = Kernels.WordpieceVocab.toSet
    assert(wp("quantization").split(" ")
      .forall(p => vocab.contains(p) || p == Kernels.WordpieceUnk))
    // greedy maximality: no piece could be extended by its successor's
    // first char and stay in vocab — spot-check a real segmentation
    val segs = wp("attention").split(" ")
    segs.sliding(2).foreach {
      case Array(p, q) if p != Kernels.WordpieceUnk =>
        assert(!vocab.contains(p + q.head),
          s"$p + ${q.head} in vocab — not maximal")
      case _ =>
    }
  }

  test("lmUnigramScore: exact ppm means vs driver recompute") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.lmUnigramScore(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // corpus: a=3, b=2, c=1, N=6 -> ppm(a)=500000, ppm(b)=333333, ppm(c)=166666
    assert(out(1L) == (3L, (500000L + 500000L + 333333L) / 3))
    assert(out(2L) == (2L, (333333L + 166666L) / 2))
    assert(out(3L) == (1L, 500000L))
  }

  test("langId picks the profile with most stopword hits, first-wins ties") {
    val df = Seq(
      (1L, "the cat of the house is here"), // en
      (2L, "el gato de la casa es grande"), // es
      (3L, "xyzzy plugh") // none -> und
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text").as("p"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "es"); assert(out(3L) == "und")
  }

  test("stats + quality score bounded and deterministic") {
    val df = Seq((1L, "the the the . . . x")).toDF("id", "text")
    val st = TextAnalysis.stats(df, "text")
    val q = st.select(TextAnalysis.qualityScore($"n_tokens", $"stop_hits",
      $"punct_chars", $"n_chars_m")).as[Double].head()
    assert(q >= 0.0 && q <= 1.0)
  }

  test("shingleFingerprint equals min of stable32 over shingles") {
    val text = "abcdefghij"
    val df = Seq((1L, text)).toDF("id", "text")
    val fp = df.select(TextAnalysis.shingleFingerprint($"text", 8)).as[Long].head()
    val expected = (1 to 3).map { i =>
      df.select(StableHash.stable32(lit(text.substring(i - 1, i - 1 + 8)))).as[Long].head()
    }.min
    assert(fp == expected)
  }
}

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions feature extraction matches SQL arithmetic") {
    val df = spark.createDataFrame(Seq((1L, "hello world"), (2L, "abc")))
      .toDF("doc_id", "text")
    val media = Multimodal.toMediaFrame(df, "doc_id", "text", "text/plain")
    assert(media.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len == 11)
    assert(feats(1L).width == 11 % 640 + 1)
    assert(feats(1L).height == (11 * 7) % 480 + 1)
    assert(feats(2L).content_md5 ==
      "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    // non-image media never takes the real-decode path
    assert(feats.values.forall(_.pixel_sum == 0L))
  }

  test("encodePng -> decode round-trips through the extractFeatures pipeline") {
    import spark.implicits._
    val recs = Seq((3L, 16, 12, 40), (4L, 9, 23, 250)).map {
      case (id, w, h, base) =>
        Multimodal.MediaRecord(id,
          Multimodal.ImageCodec.encodePng(w, h, base), "image/png")
    }
    val feats = Multimodal.extractFeatures(spark, recs.toDF()).collect()
      .map(f => f.doc_id -> f).toMap
    def analytic(w: Int, h: Int, base: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield ((x * 31 + y * 7 + base) % 256).toLong).sum
    assert(feats(3L).width == 16 && feats(3L).height == 12)
    assert(feats(3L).n_frames == 1) // an image is one frame
    assert(feats(3L).pixel_sum == analytic(16, 12, 40))
    assert(feats(4L).width == 9 && feats(4L).height == 23)
    assert(feats(4L).pixel_sum == analytic(9, 23, 250))
    // image fan-out: exactly one sampled frame per image
    val frames = Multimodal.sampleFrames(spark, recs.toDF()).collect()
    assert(frames.map(_.doc_id).sorted.toSeq == Seq(3L, 4L))
    assert(frames.forall(_.frame_idx == 0))
  }

  test("undecodable image payload falls back to the stub, pixel_sum 0") {
    import spark.implicits._
    val garbage = Multimodal.MediaRecord(5L,
      Array.tabulate[Byte](37)(i => (i * 17).toByte), "image/png")
    val f = Multimodal.extractFeatures(spark, Seq(garbage).toDF())
      .collect().head
    assert(f.width == 37 % 640 + 1 && f.height == (37 * 7) % 480 + 1)
    assert(f.pixel_sum == 0L)
  }

  test("audio WAV encode -> decode round-trips rate/frames/sample-sum") {
    // 2500 samples -> 3 windows of 1024; sum known analytically
    val samples = Array.tabulate(2500)(i => ((i * 13) % 4001 - 2000).toShort)
    val wav = Multimodal.AudioCodec.encodeWav(8000, samples)
    val Some((rate, channels, frames, sum)) =
      Multimodal.AudioCodec.decode(wav)
    assert(rate == 8000 && channels == 1 && frames == 2500L)
    assert(sum == samples.map(_.toLong).sum)
    // negative-heavy signal: sign handling through both endiannesses'
    // byte reassembly must survive (sum is negative here)
    val neg = Array.tabulate(100)(i => (-3000 + i).toShort)
    val Some((_, _, nf, nsum)) =
      Multimodal.AudioCodec.decode(Multimodal.AudioCodec.encodeWav(44100, neg))
    assert(nf == 100L && nsum == neg.map(_.toLong).sum)
  }

  test("audio media decodes for real in extractFeatures + window fan-out") {
    import spark.implicits._
    val samples = Array.tabulate(2500)(i => ((i * 7) % 201 - 100).toShort)
    val rec = Multimodal.MediaRecord(9L,
      Multimodal.AudioCodec.encodeWav(16000, samples), "audio/wav")
    val f = Multimodal.extractFeatures(spark, Seq(rec).toDF()).collect().head
    assert(f.width == 16000 && f.height == 1) // rate, channels
    assert(f.n_frames == 3)                   // ceil(2500 / 1024) windows
    assert(f.sample_sum == samples.map(_.toLong).sum)
    assert(f.pixel_sum == 0L)
    // audio fan-out: one row per 1024-frame window
    val frames = Multimodal.sampleFrames(spark, Seq(rec).toDF()).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
  }

  test("AVI/DIB video encode -> decode is byte-exact through extractFeatures") {
    import spark.implicits._
    val recs = Seq((11L, 9, 7, 4, 40), (12L, 6, 5, 2, 250)).map {
      case (id, w, h, frames, base) =>
        Multimodal.MediaRecord(id,
          Multimodal.VideoCodec.encodeAvi(w, h, frames, base), "video/avi")
    }
    val feats = Multimodal.extractFeatures(spark, recs.toDF()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(11L).width == 9 && feats(11L).height == 7)
    assert(feats(11L).n_frames == 4)
    assert(feats(11L).pixel_sum ==
      Multimodal.VideoCodec.analyticWeightedSum(9, 7, 4, 40))
    assert(feats(12L).pixel_sum ==
      Multimodal.VideoCodec.analyticWeightedSum(6, 5, 2, 250))
    // video fan-out: one sampled row per container frame
    val frames = Multimodal.sampleFrames(spark, recs.toDF()).collect()
    assert(frames.filter(_.doc_id == 11L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 1, 2, 3))
    assert(frames.filter(_.doc_id == 12L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 1))
  }

  test("MJPEG video decodes for real: exact dims/frames, lossy-tolerant sum") {
    val (w, h, frames, base) = (16, 12, 3, 77)
    val avi = Multimodal.VideoCodec.encodeAviMjpeg(w, h, frames, base)
    val Some((gw, gh, gf, gsum)) = Multimodal.VideoCodec.decode(avi)
    assert(gw == w && gh == h && gf == frames)
    // JPEG is lossy but bounded: the weighted sum must sit near the
    // exact pattern sum (same formula the DIB path hits exactly)
    val exact = Multimodal.VideoCodec.analyticWeightedSum(w, h, frames, base)
    assert(gsum > 0 && math.abs(gsum - exact).toDouble / exact < 0.25,
      s"mjpeg weighted sum $gsum vs exact $exact")
    // and the decode is deterministic
    assert(Multimodal.VideoCodec.decode(avi).get._4 == gsum)
  }

  test("undecodable video payload falls back to the stub (q_multimodal_frames path)") {
    import spark.implicits._
    val text = Multimodal.MediaRecord(7L,
      "plain text payload".getBytes("UTF-8"), "video/fake")
    val f = Multimodal.extractFeatures(spark, Seq(text).toDF()).collect().head
    assert(f.width == 18 % 640 + 1 && f.pixel_sum == 0L)
    // truncated RIFF header: parser must reject, not throw
    val truncated = Multimodal.MediaRecord(8L,
      "RIFF\u0001\u0000\u0000\u0000AVI ".getBytes("ISO-8859-1"), "video/avi")
    val g = Multimodal.extractFeatures(spark, Seq(truncated).toDF())
      .collect().head
    assert(g.pixel_sum == 0L)
  }

  test("undecodable audio payload falls back to the stub, sample_sum 0") {
    import spark.implicits._
    val garbage = Multimodal.MediaRecord(6L,
      Array.tabulate[Byte](41)(i => (i * 23).toByte), "audio/wav")
    val f = Multimodal.extractFeatures(spark, Seq(garbage).toDF())
      .collect().head
    assert(f.width == 41 % 640 + 1 && f.sample_sum == 0L)
  }
}

class StreamingSpec extends SparkSpec {

  test("stream-static enrichment join equals the batch join rollup") {
    val streamed = graft.streaming.EventStream
      .staticEnrichedRollup(spark, sfDir, queryName = "t_enriched")
      .collect().map(_.toSeq).toSet
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = graft.Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(expr("ts_ns DIV 3600000000000").as("epoch_h"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("native session_window rollup equals the batch islands sessionizer") {
    val streamed = graft.streaming.EventStream
      .sessionWindowRollup(spark, sfDir, gapUs = 1800L * 1000000,
        queryName = "t_sesswin")
      .collect().map(_.toSeq).toSet
    // batch islands twin: break at gap >= 30 min, end = last + gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts_us") - col("prev") >= 1800L * 1000000, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) + 1800L * 1000000).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("vc")).as("value_cents"))
      .select("user_id", "start_us", "end_us", "n_events", "value_cents")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming CDC latest-per-key equals the batch applyLatest") {
    val streamed = graft.streaming.EventStream
      .latestPerUserStream(spark, sfDir, "t_cdc")
      .collect().map(_.toSeq).toSet
    val changes = graft.Tables.events(spark, sfDir).select(col("user_id"),
      expr("ts_ns DIV 1000").as("ts_us"), col("event_id"),
      col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
    val batch = graft.operators.ChangeCapture.applyLatest(changes,
        Seq("user_id"), Seq("ts_us", "event_id"),
        col("event_type") === "error")
      .select("user_id", "event_id", "event_type", "value_cents", "ts_us")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stateful mapGroupsWithState totals equal the batch groupBy") {
    val streamed = graft.streaming.EventStream
      .runningUserTotals(spark, sfDir, "t_totals")
      .collect().map(_.toSeq).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("frame sampling honors the everyNth stride") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.toMediaFrame(
      Seq((1L, "x" * 25)).toDF("doc_id", "text"), "doc_id", "text", "video/fake")
    // 25 bytes -> 25 % 30 + 1 = 26 frames at stride 1
    val all = graft.multimodal.Multimodal.sampleFrames(spark, media).collect()
    val strided = graft.multimodal.Multimodal
      .sampleFrames(spark, media, everyNth = 2).collect()
    assert(all.length == 26)
    assert(strided.map(_.frame_idx).toSeq.sorted == (0 until 26 by 2).toSeq)
    // strided hashes must match the corresponding full-sample frames
    val byIdx = all.map(f => f.frame_idx -> f.frame_md5).toMap
    assert(strided.forall(f => byIdx(f.frame_idx) == f.frame_md5))
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = graft.streaming.EventStream
      .purchaseClickJoin(spark, sfDir, "t_pcjoin")
      .collect().map(_.toSeq).toSet
    val e = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("ts_us"))
    val batch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts_us"))
      .join(e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"), col("ts_us").as("c_ts_us")),
        expr("user_id = c_user AND c_ts_us BETWEEN p_ts_us - 3600000000 AND p_ts_us"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts_us"), col("c_ts_us"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("watermarked streaming dedup keeps exactly the distinct user set") {
    val streamed = graft.streaming.EventStream
      .dedupedUsers(spark, sfDir, queryName = "t_dedup")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization equals the batch sessionizer") {
    val streamed = graft.streaming.EventStream
      .sessionizeStream(spark, sfDir, graft.Queries.SessionGapUs, "t_sess")
      .collect().map(_.toSeq).toSet
    val batch = graft.Queries.sessionize(spark, sfDir)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("duration_us"), col("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming sliding rollup equals the batch two-window expansion") {
    val streamed = graft.streaming.EventStream
      .slidingRollup(spark, sfDir, queryName = "t_sliding")
      .collect().map(_.toSeq).toSet
    val ev = graft.Tables.events(spark, sfDir)
      .select(expr("ts_ns DIV 3600000000000").as("h"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
    val batch = ev.select(col("h").as("ws"), col("event_type"), col("c"))
      .unionAll(ev.select((col("h") - 1).as("ws"), col("event_type"), col("c")))
      .groupBy(col("ws").as("win_start_h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("c")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming hourly rollup equals the batch equivalent") {
    val streamed = graft.streaming.EventStream
      .hourlyRollup(spark, sfDir, queryName = "t_hourly")
      .collect().map(_.toSeq).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(expr("ts_ns DIV 3600000000000").as("epoch_h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
