package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** JVM kernels invoked from whole-stage codegen.
  *
  * The declarative formulation of shingling —
  * `transform(sequence(...), i -> stable32(substr(text, i, n)))` — is a
  * higher-order-function chain that Spark evaluates INTERPRETED: one
  * Substring + Md5 + Conv expression tree walk per shingle, allocating
  * hex strings along the way (measured ~2.5 s of the sf0.1 minhash
  * pipeline). These kernels run the identical arithmetic as one tight
  * compiled loop per row; the wrapping [[ShingleHash32]] expression
  * keeps the whole stage inside codegen.
  *
  * Determinism contract: byte-for-byte the same values as
  * [[graft.functions.StableHash.stable32]] (first 32 bits of md5), so
  * DuckDB oracle SQL generated from StableHash stays valid.
  */
object Kernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 32 md5 bits of the UTF-8 bytes as a non-negative long —
    * exactly `conv(substr(md5(s),1,8),16,10)`. */
  def stable32(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** stable32 over the DISTINCT character n-gram shingles of `text`,
    * first-occurrence order. Semantics mirror
    * `array_distinct(transform(sequence(1, greatest(numChars-(n-1),1)),
    * i -> stable32(substr(text, i, n))))`: 1-based char positions, at
    * least one (possibly short/empty) shingle. Never null, never empty.
    */
  def shingleHash32(text: UTF8String, n: Int): UnsafeArrayData = {
    val chars = text.numChars()
    val count = math.max(chars - (n - 1), 1)
    val seen = new java.util.HashSet[UTF8String](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 1
    while (i <= count) {
      val sh = text.substringSQL(i, n)
      if (seen.add(sh)) {
        out(m) = stable32(sh.getBytes)
        m += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == count) out else java.util.Arrays.copyOf(out, m))
  }

  /** Unicode NFC canonical composition; returns the input object
    * unchanged (no copy) when already normalized — the common case for
    * ASCII-dominated corpora. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Fixed subword vocabulary for [[wordpiece]]: all lowercase ASCII
    * letters and digits as singletons (so alphanumeric text never
    * yields <unk>), common English digraphs/trigraphs, and a few
    * 4-grams. ONE definition — oracle SQL is generated from this list
    * (QueriesML.wordpieceSql), never duplicated. */
  val WordpieceVocab: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString) ++
      Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
        "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
        "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
        "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her",
        "ter", "tion", "atio")

  val WordpieceUnk = "<unk>"
  private val WpMaxLen = WordpieceVocab.map(_.length).max
  private val wpSets: Array[java.util.HashSet[String]] = {
    val a = Array.fill(WpMaxLen + 1)(new java.util.HashSet[String]())
    WordpieceVocab.foreach(p => a(p.length).add(p))
    a
  }

  /** Greedy longest-match segmentation of every space-split word of
    * `text` (lowercased) against [[WordpieceVocab]]; pieces joined by
    * single spaces across the whole document; unmatched positions emit
    * [[WordpieceUnk]] and advance one char. Empty words skipped. */
  def wordpiece(text: UTF8String): UTF8String = {
    val doc = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(doc.length * 2)
    var wStart = 0
    val n = doc.length
    var i = 0
    while (i <= n) {
      if (i == n || doc.charAt(i) == ' ') {
        var p = wStart
        while (p < i) {
          var len = math.min(WpMaxLen, i - p)
          var matched = 0
          while (len >= 1 && matched == 0) {
            if (wpSets(len).contains(doc.substring(p, p + len))) matched = len
            len -= 1
          }
          if (out.length > 0) out.append(' ')
          if (matched > 0) {
            out.append(doc, p, p + matched)
            p += matched
          } else {
            out.append(WordpieceUnk)
            // advance a full CODE POINT, not a UTF-16 unit: the oracle's
            // substr() is character-based, and splitting a surrogate
            // pair would emit two <unk>s where any char-addressed
            // engine emits one
            p += Character.charCount(doc.codePointAt(p))
          }
        }
        wStart = i + 1
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  private val space = UTF8String.fromString(" ")

  /** One-pass duplication stats over the space-split token stream:
    * `[n_tokens, n_distinct_tokens, n_bigrams, n_distinct_bigrams]`.
    * Split semantics mirror `split(text, ' ')` (empty tokens from
    * consecutive/leading/trailing separators KEPT; splitting "" yields
    * one empty token), bigram text mirrors `concat_ws(" ", t_i,
    * t_i+1)`. Replaces an interpreted split + transform(sequence) +
    * two array_distinct chain — four array materializations per row —
    * with one compiled scan and two hash sets.
    */
  def dupStats(text: UTF8String): UnsafeArrayData = {
    // split on the SPACE BYTE: 0x20 in UTF-8 is always the space
    // character (continuation bytes are >= 0x80), so byte scanning is
    // char-correct and allocation-free until a token is materialized
    val b = text.getBytes
    val toks = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == 0x20) {
        toks.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    toks.add(UTF8String.fromBytes(b, start, b.length - start))
    val nToks = toks.size()
    val seenT = new java.util.HashSet[UTF8String](nToks * 2)
    var dT = 0
    var j = 0
    while (j < nToks) {
      if (seenT.add(toks.get(j))) dT += 1
      j += 1
    }
    val nGrams = math.max(nToks - 1, 0)
    val seenG = new java.util.HashSet[UTF8String](nGrams * 2 + 1)
    var dG = 0
    j = 0
    while (j < nGrams) {
      val g = UTF8String.concat(toks.get(j), space, toks.get(j + 1))
      if (seenG.add(g)) dG += 1
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array[Long](nToks.toLong, dT.toLong, nGrams.toLong, dG.toLong))
  }

  /** Count of space-split tokens (WITH multiplicity) contained in
    * `set` — the membership loop behind stopword counting and the
    * language-ID profiles. */
  def tokenSetCount(text: UTF8String,
                    set: java.util.HashSet[UTF8String]): Int = {
    val toks = text.split(space, -1)
    var i = 0
    var n = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  /** 32-bit SimHash over space-split word tokens WITH multiplicity —
    * per-row equivalent of the explode+groupBy formulation
    * `sum(+-1 per token-hash bit j) -> sign -> bit j`: no explode, no
    * shuffle, one compiled pass. Tokens keep empties (regex-split
    * semantics); every non-null text yields a signature. */
  def simhash32(text: UTF8String): Long = {
    val toks = text.split(space, -1)
    val counts = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = stable32(toks(i).getBytes)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Exact Jaccard similarity of the DISTINCT word w-gram shingle sets
    * of two texts — the per-pair verification step of LSH→verify
    * near-dup dedup. Set semantics identical to [[wordShingles]]
    * (split on single spaces keeping empties, short-tail slices, min
    * one shingle), so the DuckDB word-shingle CTE oracle computes the
    * bit-identical double (intersection/sizes are exact ints; IEEE
    * division is portable).
    *
    * Implementation works on raw UTF-8 bytes: a space-joined w-gram
    * equals the original byte span from token i's start to token
    * (i+w-1)'s end (0x20 never occurs inside a multi-byte UTF-8 char),
    * so shingles are (start,end) spans — no per-shingle string is ever
    * built. Dedup/intersection run over an open-addressed table of
    * span hashes with EXACT byte-compare on collision (first cut used
    * UTF8String.split + concatWs + HashSet: 24 us/pair, all regex +
    * allocation; this path is ~20x cheaper). */
  def wordJaccard(a: UTF8String, b: UTF8String, w: Int): Double = {
    val ab = a.getBytes
    val bb = b.getBytes
    val spansA = shingleSpans(ab, w)
    val spansB = shingleSpans(bb, w)
    val ca = spansA.length >> 1
    val cb = spansB.length >> 1
    // one shared open-addressed table; capacity pow2 >= 2*(ca+cb).
    // entries: packed span + owner bit; exact byte equality on probe.
    var cap = 4
    while (cap < (ca + cb) * 2) cap <<= 1
    val mask = cap - 1
    val slotSrc = new Array[Byte](cap) // 0 empty, 1 = A, 2 = B(new)
    val slotStart = new Array[Int](cap)
    val slotEnd = new Array[Int](cap)
    var na = 0
    var i = 0
    while (i < ca) {
      val s = spansA(2 * i); val e = spansA(2 * i + 1)
      var slot = slotFor(ab, s, e, mask)
      var done = false
      while (!done) {
        if (slotSrc(slot) == 0) {
          slotSrc(slot) = 1; slotStart(slot) = s; slotEnd(slot) = e
          na += 1; done = true
        } else if (spanEq(ab, slotStart(slot), slotEnd(slot), ab, s, e)) {
          done = true // duplicate within A
        } else slot = (slot + 1) & mask
      }
      i += 1
    }
    var nb = 0
    var inter = 0
    i = 0
    while (i < cb) {
      val s = spansB(2 * i); val e = spansB(2 * i + 1)
      var slot = slotFor(bb, s, e, mask)
      var done = false
      while (!done) {
        val src = slotSrc(slot)
        if (src == 0) {
          slotSrc(slot) = 2; slotStart(slot) = s; slotEnd(slot) = e
          nb += 1; done = true
        } else {
          val owner = if (src == 2) bb else ab // src 1|3 spans index into A's bytes
          if (spanEq(owner, slotStart(slot), slotEnd(slot), bb, s, e)) {
            if (src == 1) {
              // shared with A: count once, convert to a B entry too —
              // mark as counted so later B-duplicates don't recount
              slotSrc(slot) = 3; inter += 1; nb += 1
            } // src 2 or 3: duplicate within B
            done = true
          } else slot = (slot + 1) & mask
        }
      }
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Word w-gram shingle spans of `bytes` as packed (start,end) pairs —
    * the byte-span twin of [[wordShingles]]'s enumeration (before
    * dedup): split on 0x20 keeping empties, count = max(ntok-(w-1),1),
    * short tail allowed. */
  private def shingleSpans(bytes: Array[Byte], w: Int): Array[Int] = {
    var ntok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') ntok += 1; i += 1 }
    val tokStart = new Array[Int](ntok)
    val tokEnd = new Array[Int](ntok)
    var t = 0
    tokStart(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { tokEnd(t) = i; t += 1; tokStart(t) = i + 1 }
      i += 1
    }
    tokEnd(t) = bytes.length
    val count = math.max(ntok - (w - 1), 1)
    val spans = new Array[Int](count * 2)
    i = 0
    while (i < count) {
      spans(2 * i) = tokStart(i)
      spans(2 * i + 1) = tokEnd(math.min(i + w, ntok) - 1)
      i += 1
    }
    spans
  }

  /** FNV-1a slot hash of a byte span, folded to table width. */
  private def slotFor(bytes: Array[Byte], from: Int, until: Int,
                      mask: Int): Int = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    ((h ^ (h >>> 32)).toInt) & mask
  }

  private def spanEq(x: Array[Byte], xs: Int, xe: Int,
                     y: Array[Byte], ys: Int, ye: Int): Boolean = {
    if (xe - xs != ye - ys) return false
    var i = xs
    var j = ys
    while (i < xe) {
      if (x(i) != y(j)) return false
      i += 1; j += 1
    }
    true
  }

  /** DISTINCT word w-gram shingles, first-occurrence order. Semantics
    * mirror `array_distinct(transform(sequence(1, greatest(numToks-(w-1)
    * ,1)), i -> concat_ws(' ', slice(split(text,' '), i, w))))`: regex
    * split keeping empty tokens, short tail slices allowed, at least
    * one shingle. Never null. */
  def wordShingles(text: UTF8String, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.split(space, -1)
    val nToks = toks.length
    val count = math.max(nToks - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + w, nToks)
      val sh =
        if (end - i == 1) toks(i)
        else UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, i, end): _*)
      seen.add(sh)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  // -------------------------------------------------------------------
  // EXACT-SUBSTRING screen: polynomial rolling hash over every w-char
  // window, probed against a Bloom filter of benchmark-anchor hashes.
  // The published-eval decontamination hygiene step: n-gram collision
  // (the [[graft.operators.Curation.decontaminate]] protocol) finds
  // paraphrase-level overlap; THIS finds verbatim inclusions with zero
  // false negatives — if a benchmark string occurs in the document,
  // its first-w-chars window occurs too, so its anchor hash is probed.
  // O(chars) per document with an O(1) hash slide; false positives are
  // re-checked exactly by the caller.
  // -------------------------------------------------------------------

  /** The polynomial hash (base 31, Long wraparound — identical
    * arithmetic driver- and executor-side) of `s`'s FIRST `w` chars.
    * Driver-side anchor builder; `s.length >= w` required. */
  def windowHash(s: String, w: Int): Long = {
    var h = 0L
    var i = 0
    while (i < w) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  /** splitmix64 finalizer — the k Bloom probe positions of one hash. */
  private def mix(h0: Long, salt: Long): Long = {
    var z = h0 + salt
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // k=6 probes against the 64-bits-per-anchor filters the callers
  // build: per-WINDOW false-positive rate (1-e^(-6/64))^6 ~= 5e-7, so
  // even a megabyte-long document survives the screen spuriously with
  // probability ~0.5 — the per-DOCUMENT budget that keeps the exact
  // re-check stage O(true hits) on long-document corpora (a 16-bit/k=3
  // filter's ~0.5%/window rate made every multi-KB document survive).
  private val BloomProbes = 6

  /** Set the probe bits of every hash into a fresh word array of
    * `1 << bitsLog2` bits (bitsLog2 >= 6). */
  def bloomBuild(hashes: Array[Long], bitsLog2: Int): Array[Long] = {
    val words = new Array[Long](1 << (bitsLog2 - 6))
    val bits = words.length.toLong * 64L
    hashes.foreach { h =>
      var k = 0
      while (k < BloomProbes) {
        val bit = java.lang.Long.remainderUnsigned(
          mix(h, k * 0x9e3779b97f4a7c15L), bits)
        words((bit >>> 6).toInt) |= 1L << (bit & 63L)
        k += 1
      }
    }
    words
  }

  /** Whether the Bloom filter may contain `h` (no false negatives). */
  def bloomMaybe(h: Long, words: Array[Long]): Boolean = {
    val bits = words.length.toLong * 64L
    var k = 0
    while (k < BloomProbes) {
      val bit = java.lang.Long.remainderUnsigned(
        mix(h, k * 0x9e3779b97f4a7c15L), bits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L)
        return false
      k += 1
    }
    true
  }

  /** True iff ANY w-char window of `text` Bloom-hits — one compiled
    * pass, O(1) per slide, early exit on the first hit. */
  def rollingBloomHit(text: UTF8String, w: Int,
                      words: Array[Long]): Boolean = {
    val s = text.toString
    val n = s.length
    if (n < w) return false
    var h = 0L
    var i = 0
    while (i < w) { h = h * 31 + s.charAt(i); i += 1 }
    var powW = 1L
    i = 1
    while (i < w) { powW *= 31; i += 1 } // 31^(w-1)
    var pos = 0
    while (pos <= n - w) {
      if (pos > 0)
        h = (h - s.charAt(pos - 1) * powW) * 31 + s.charAt(pos + w - 1)
      if (bloomMaybe(h, words)) return true
      pos += 1
    }
    false
  }

  /** ALL DISTINCT `w`-char window rolling hashes of `text` — the
    * index-build side of text-anchor file skipping
    * ([[graft.sources.TextIndex]]): each data file's windows fold
    * into a per-file Bloom, so a `contains`/decontamination query can
    * prune FILES before any rolling pass runs. Same O(chars) pass and
    * O(1) slide as the probe kernels. */
  def rollingWindowHashes(text: UTF8String, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val n = s.length
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.max(0, n - w + 1))
    if (n >= w) {
      var h = 0L
      var i = 0
      while (i < w) { h = h * 31 + s.charAt(i); i += 1 }
      var powW = 1L
      i = 1
      while (i < w) { powW *= 31; i += 1 }
      var pos = 0
      while (pos <= n - w) {
        if (pos > 0)
          h = (h - s.charAt(pos - 1) * powW) * 31 + s.charAt(pos + w - 1)
        if (seen.add(h)) out += h
        pos += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** The DISTINCT matched window hashes of `text` against the Bloom
    * filter — the anchor-returning variant of [[rollingBloomHit]]:
    * instead of a boolean, the caller gets WHICH anchors (possibly)
    * occur, so the exact re-check can equi-join document→snippet on
    * the anchor hash (Bloom false positives match no true anchor and
    * fall out of the join for free) rather than nested-loop every
    * survivor against every benchmark string. Same O(chars) pass,
    * O(1) slide; the result is tiny (true inclusions + ~per-document
    * Bloom FP budget). */
  def rollingBloomAnchors(text: UTF8String, w: Int,
                          words: Array[Long])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](4)
    if (n >= w) {
      var seen: java.util.HashSet[java.lang.Long] = null
      var h = 0L
      var i = 0
      while (i < w) { h = h * 31 + s.charAt(i); i += 1 }
      var powW = 1L
      i = 1
      while (i < w) { powW *= 31; i += 1 } // 31^(w-1)
      var pos = 0
      while (pos <= n - w) {
        if (pos > 0)
          h = (h - s.charAt(pos - 1) * powW) * 31 + s.charAt(pos + w - 1)
        if (bloomMaybe(h, words)) {
          if (seen == null) seen = new java.util.HashSet[java.lang.Long]()
          if (seen.add(h)) out += h
        }
        pos += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `graft_rolling_bloom_hit(text)`: whether any `w`-char window of the
  * document rolling-hash-hits the (plan-carried) Bloom filter of
  * benchmark anchors — the compiled screen of exact-substring
  * decontamination ([[graft.operators.Curation.decontaminateExact]]).
  * Boolean, null-safe, whole-stage-codegen'd; the filter rides the
  * plan as a broadcast-style reference object (bits sized by the
  * builder — ~64 per anchor for the per-document FP budget). */
case class RollingBloomHit(child: Expression, w: Int,
                           words: Array[Long]) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_rolling_bloom_hit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w > 0 && words.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string), w > 0 and a non-empty filter")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.rollingBloomHit(input.asInstanceOf[UTF8String], w, words)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.rollingBloomHit($c, $w, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingBloomHit = copy(child = newChild)
}

/** `graft_rolling_bloom_anchors(text)`: the DISTINCT `w`-char window
  * rolling hashes of the document that hit the (plan-carried) Bloom
  * filter of benchmark anchors — the screen stage of exact-substring
  * decontamination ([[graft.operators.Curation.decontaminateExact]]).
  * Returning the matched anchors (not a boolean) lets the exact
  * re-check run as an anchor-hash EQUI-join to only the snippets
  * sharing that anchor — O(true hits), never survivors × benchmark.
  * array<long>, null-safe, whole-stage-codegen'd. */
case class RollingBloomAnchors(child: Expression, w: Int,
                               words: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_bloom_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w > 0 && words.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string), w > 0 and a non-empty filter")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.rollingBloomAnchors(input.asInstanceOf[UTF8String], w, words)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.rollingBloomAnchors($c, $w, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingBloomAnchors = copy(child = newChild)
}

/** `graft_rolling_window_hashes(text)`: ALL distinct `w`-char window
  * rolling hashes of the document — the index-BUILD kernel of
  * text-anchor file skipping ([[graft.sources.TextIndex]]); the
  * probe-side twins are [[RollingBloomHit]]/[[RollingBloomAnchors]].
  * array<long>, null-safe, whole-stage-codegen'd. */
case class RollingWindowHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string) and w > 0")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.rollingWindowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.rollingWindowHashes($c, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingWindowHashes = copy(child = newChild)
}

/** `graft_shingle_hash32(text, n)`: array of stable32 hashes of the
  * distinct character n-gram shingles — the codegen'd front half of the
  * minhash signature pipeline (back half: [[MinhashSignature]]).
  */
case class ShingleHash32(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string) and n > 0")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.shingleHash32(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.shingleHash32($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
}

/** `graft_dup_stats(text)`: `[n_tokens, n_distinct_tokens, n_bigrams,
  * n_distinct_bigrams]` of the space-split token stream in one compiled
  * pass — the kernel behind intra-document repetition signals.
  */
case class DupStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dup_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string)")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.dupStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.dupStats($c);")

  override protected def withNewChildInternal(newChild: Expression): DupStats =
    copy(child = newChild)
}

/** `graft_word_shingles(text, w)`: distinct word w-gram shingle array —
  * one compiled pass instead of the interpreted
  * split/transform/slice/concat_ws chain (the dominant per-row cost of
  * n-gram Jaccard, which references the shingling subtree from several
  * plan branches).
  */
case class WordShingleArray(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string) and w > 0")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.wordShingles($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleArray =
    copy(child = newChild)
}

/** `graft_word_jaccard(text_a, text_b, w)`: exact Jaccard of the two
  * texts' distinct word w-gram shingle sets as ONE per-pair compiled
  * pass — the verification step of LSH→verify dedup. Joining each pair
  * to pre-built shingle(-hash) ARRAYS instead materializes kilobytes of
  * array payload per candidate through the join output (measured ~8 s
  * of the sf0.1 near-dup query); this kernel keeps the pair row at two
  * strings and emits one double.
  */
case class WordJaccard(left: Expression, right: Expression, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_word_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if w > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) and w > 0")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.wordJaccard(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Kernels.wordJaccard($a, $b, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordJaccard =
    copy(left = newLeft, right = newRight)
}

/** `graft_token_set_count(text)`: tokens-in-set count as one compiled
  * pass, replacing the interpreted `size(filter(split(text),
  * array_contains(...)))` chain — evaluated once per language profile
  * per row in language-ID. Constructed directly as an expression (no
  * registry needed); the set travels via the codegen references array.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_token_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string)")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.tokenSetCount(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.tokenSetCount($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

/** `graft_simhash32(text)`: whole SimHash signature as one per-row
  * scalar — turns the simhash operator from tokenize-explode +
  * 32-conditional-sum groupBy (a full shuffle of every token) into a
  * narrow codegen'd map.
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string)")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

/** `graft_nfc(text)`: Unicode NFC normalization (canonical composition)
  * as a codegen'd scalar — the first step of the standard text-cleanup
  * ladder (NFC -> case fold -> whitespace collapse). Backed by
  * `java.text.Normalizer`, which implements the same Unicode canonical
  * composition as DuckDB's `nfc_normalize`, so normalized output is
  * engine-portable and the downstream pipeline hash-gates. The kernel
  * short-circuits via `Normalizer.isNormalized` — for the typical
  * mostly-ASCII corpus the cost is one scan of the string, no
  * allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string)")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `graft_wordpiece(text)`: greedy longest-match subword segmentation
  * against the FIXED vocabulary [[Kernels.WordpieceVocab]], returning
  * every word's pieces joined by single spaces (words are the
  * space-split tokens; empty tokens are skipped). A position with no
  * matching piece emits `<unk>` and advances one character. This is
  * the wordpiece/BPE-apply shape (greedy maximal munch over a piece
  * vocabulary) with a literal vocabulary, so the segmentation is
  * reproducible by any engine that can express "longest prefix in a
  * fixed set" — the DuckDB oracle does it with a recursive CTE.
  *
  * Scale: pure per-row narrow map inside whole-stage codegen; the
  * vocabulary lives in a shared immutable lookup (length-bucketed hash
  * sets), so cost is O(chars x maxPieceLen) per row with zero
  * allocation beyond the output builder.
  */
case class WordpieceEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string)")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.wordpiece(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.wordpiece($c);")

  override protected def withNewChildInternal(newChild: Expression): WordpieceEncode =
    copy(child = newChild)
}
