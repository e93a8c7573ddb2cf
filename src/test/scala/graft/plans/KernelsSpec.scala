package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.StableHash
import graft.operators.Dedup

/** The codegen'd text kernels must be bit-identical to their
  * declarative (higher-order-function) specifications — the oracle SQL
  * is generated from the declarative form, so any divergence breaks the
  * cross-engine gate.
  */
class KernelsSpec extends SparkSpec {

  import spark.implicits._

  // edge cases: empty, shorter than n, exact n, repeats (distinct),
  // multiple/leading/trailing spaces (empty tokens), non-ASCII chars
  private val texts = Seq(
    "", "a", "abcd", "abcde", "abcdef", "aaaaaaaaaa",
    "one two three four five", "one  two", " leading", "trailing ",
    "dup dup dup dup", "café naïve résumé 你好",
    "x y", "single")

  private def df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("ShingleHash32 kernel == array_distinct(transform(substr))+stable32") {
    graft.plans.GraftFunctions.register(spark)
    for (n <- Seq(1, 3, 5, 8)) {
      val positions = sequence(lit(1), greatest(length($"text") - (n - 1), lit(1)))
      val decl = transform(
        array_distinct(transform(positions, i => $"text".substr(i, lit(n)))),
        s => StableHash.stable32(s))
      val bad = df.select(
          call_function(GraftFunctions.ShingleHashName, $"text", lit(n)).as("k"),
          decl.as("d"))
        .filter(not($"k" === $"d"))
      assert(bad.count() == 0, s"n=$n: ${bad.collect().mkString(";")}")
    }
  }

  test("WordShingleArray kernel == array_distinct(transform(concat_ws(slice(split))))") {
    graft.plans.GraftFunctions.register(spark)
    for (w <- Seq(1, 2, 3, 5)) {
      val bad = df.select(
          call_function(GraftFunctions.WordShinglesName, $"text", lit(w)).as("k"),
          Dedup.wordShingleArray($"text", w).as("d"))
        .filter(not($"k" === $"d"))
      assert(bad.count() == 0, s"w=$w: ${bad.collect().mkString(";")}")
    }
  }

  test("TokenSetCount kernel == size(filter(split)) declarative twin") {
    for (set <- Seq(Seq("the", "a"), Seq("one", "café", ""), Seq("zzz"))) {
      val bad = df.select(
          graft.operators.TextAnalysis.tokenSetCount($"text", set).as("k"),
          graft.operators.TextAnalysis.tokenSetCountDeclarative($"text", set).as("d"))
        .filter($"k" =!= $"d")
      assert(bad.count() == 0, s"set=$set: ${bad.collect().mkString(";")}")
    }
  }

  test("Simhash32 kernel == explode+groupBy bit-sum aggregation") {
    graft.plans.GraftFunctions.register(spark)
    val in = df
    val toks = in.select($"id", explode(split($"text", " ")).as("tok"))
      .withColumn("h", StableHash.stable32($"tok"))
    val bitSums = (0 until 32).map { j =>
      sum(when(shiftright($"h", j) % 2 === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy($"id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 32).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val decl = agg.select($"id", sig.as("d"))
    val kern = in.select($"id",
      call_function(GraftFunctions.Simhash32Name, $"text").as("k"))
    val bad = kern.join(decl, "id").filter($"k" =!= $"d")
    assert(bad.count() == 0, bad.collect().mkString(";"))
  }

  test("property: kernels == declarative twins on random strings") {
    graft.plans.GraftFunctions.register(spark)
    val gen = new scala.util.Random(42)
    val alphabet = "ab c.dé!"
    val rand = (0 until 200).map { i =>
      (i.toLong, (0 until gen.nextInt(30)).map(_ =>
        alphabet(gen.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val n = 4
    val positions = sequence(lit(1), greatest(length($"text") - (n - 1), lit(1)))
    val declSh = transform(
      array_distinct(transform(positions, i => $"text".substr(i, lit(n)))),
      s => StableHash.stable32(s))
    val bad = rand.select(
        call_function(GraftFunctions.ShingleHashName, $"text", lit(n)).as("k1"),
        declSh.as("d1"),
        call_function(GraftFunctions.WordShinglesName, $"text", lit(2)).as("k2"),
        Dedup.wordShingleArray($"text", 2).as("d2"))
      .filter(not($"k1" === $"d1") || not($"k2" === $"d2"))
    assert(bad.count() == 0, bad.collect().take(3).mkString(";"))
  }

  test("WordJaccard kernel == array_intersect over wordShingleArray sets") {
    graft.plans.GraftFunctions.register(spark)
    // all ordered pairs of the edge-case texts, incl. identical pairs,
    // empty-vs-empty, unicode, duplicate shingles, empty tokens
    val pairs = texts.zipWithIndex.flatMap { case (ta, i) =>
      texts.zipWithIndex.map { case (tb, j) =>
        (i.toLong * 100 + j, ta, tb)
      }
    }.toDF("pid", "ta", "tb")
    for (w <- Seq(1, 2, 3)) {
      val sa = Dedup.wordShingleArray($"ta", w)
      val sb = Dedup.wordShingleArray($"tb", w)
      val inter = size(array_intersect(sa, sb))
      val decl = inter.cast("double") /
        (size(sa) + size(sb) - inter).cast("double")
      val bad = pairs.select($"pid", $"ta", $"tb",
          call_function(GraftFunctions.WordJaccardName,
            $"ta", $"tb", lit(w)).as("k"),
          decl.as("d"))
        .filter($"k" =!= $"d")
      assert(bad.count() == 0, s"w=$w: ${bad.collect().take(3).mkString(";")}")
    }
  }

  test("property: WordJaccard == declarative on random string pairs") {
    graft.plans.GraftFunctions.register(spark)
    val gen = new scala.util.Random(7)
    val alphabet = "ab c.dé !x"
    val rand = (0 until 300).map { i =>
      def s() = (0 until gen.nextInt(40)).map(_ =>
        alphabet(gen.nextInt(alphabet.length))).mkString
      (i.toLong, s(), s())
    }.toDF("pid", "ta", "tb")
    val w = 3
    val sa = Dedup.wordShingleArray($"ta", w)
    val sb = Dedup.wordShingleArray($"tb", w)
    val inter = size(array_intersect(sa, sb))
    val decl = inter.cast("double") /
      (size(sa) + size(sb) - inter).cast("double")
    val bad = rand.select($"pid",
        call_function(GraftFunctions.WordJaccardName, $"ta", $"tb", lit(w)).as("k"),
        decl.as("d"))
      .filter($"k" =!= $"d")
    assert(bad.count() == 0, bad.collect().take(3).mkString(";"))
  }

  test("DupStats kernel == declarative split/array_distinct twin") {
    graft.plans.GraftFunctions.register(spark)
    val gen = new scala.util.Random(7)
    val alphabet = "ab α💡 "
    val texts = (1 to 300).map { i =>
      val s = (0 until gen.nextInt(30))
        .map(_ => alphabet(gen.nextInt(alphabet.length))).mkString
      (i.toLong, s)
    } ++ Seq((0L, ""), (1000L, " "), (1001L, "  "), (1002L, "a a a"),
      (1003L, "a b a b"), (1004L, " lead"), (1005L, "trail "))
    val df = texts.toDF("id", "text")
    val toks = split($"text", " ")
    val grams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    val bad = df.select($"id",
        call_function(GraftFunctions.DupStatsName, $"text").as("k"),
        array(size(toks).cast("long"),
          size(array_distinct(toks)).cast("long"),
          size(grams).cast("long"),
          size(array_distinct(grams)).cast("long")).as("d"))
      .filter($"k" =!= $"d")
    assert(bad.count() == 0, bad.collect().take(5).mkString(";"))
  }

  test("kernels survive whole-stage codegen (no interpreted fallback errors)") {
    graft.plans.GraftFunctions.register(spark)
    val out = df.select(
      call_function(GraftFunctions.MinhashName,
        call_function(GraftFunctions.ShingleHashName, $"text", lit(5)),
        lit(8)).as("sig"))
    assert(out.count() == texts.length)
  }
}
