package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism design: embeddings are converted to FIXED-POINT integers
  * (round(x * 2^20) as long). Dot products and norms then stay exact
  * (64 dims x (2^20)^2 products < 2^53), so cosine similarity is
  * bit-identical in every engine regardless of summation order — the
  * reason ANN results here can be hash-compared against a SQL oracle.
  *
  * Performance design:
  *  - the inner product is [[graft.plans.DotProductLong]], a native
  *    codegen'd Catalyst expression (interpreted zip_with+aggregate was
  *    ~30x slower at sf0.1);
  *  - squared norms are computed ONCE per vector before any join, never
  *    per pair;
  *  - [[bruteTopK]] broadcasts the (small) query side: scoring is a
  *    narrow map over the corpus — no corpus shuffle; only the scored
  *    (query, cand, cos) rows shuffle into the per-query top-k cut.
  *  - [[lshBucketTopK]]: deterministic sign-random-projection buckets
  *    replace the full scan per query with bucket-local candidates —
  *    the 100 TB path (recall < 1 by construction).
  */
object Similarity {

  val Scale: Long = 1L << 20

  /** array<float> -> array<bigint> fixed-point. */
  def fixedPoint(c: Column): Column =
    transform(c, x => round(x * lit(Scale.toDouble)).cast("long"))

  /** Exact integer dot product (native codegen'd expression; the
    * session must have called GraftFunctions.register — all operators
    * here do). */
  def dotFixed(a: Column, b: Column): Column =
    call_function(GraftFunctions.DotLongName, a, b)

  /** Cosine from a precomputed-norm pair: dot / sqrt(na2 * nb2). */
  private def cosFromNorms(dot: Column, na2: Column, nb2: Column): Column =
    dot.cast("double") / sqrt(na2.cast("double") * nb2.cast("double"))

  /** (id, v fixed, n2) projection — norms computed once per vector. */
  private def prep(df: DataFrame, idCol: String, vecCol: String,
                   idAs: String, vAs: String, nAs: String): DataFrame = {
    val v = fixedPoint(col(vecCol))
    df.select(col(idCol).as(idAs), v.as(vAs))
      .withColumn(nAs, dotFixed(col(vAs), col(vAs)))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast). Self-pairs excluded. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = prep(queries, idCol, vecCol, "query_id", "qv", "qn2")
    val c = prep(corpus, idCol, vecCol, "cand_id", "cv", "cn2")
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos",
        cosFromNorms(dotFixed(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Top-k via the native [[graft.plans.TopKAgg]]
    * TypedImperativeAggregate: partial (map-side) top-k cut, so the
    * shuffle carries at most k candidates per query per partition — the
    * 100 TB path. Row-identical to [[bruteTopK]] (same score-desc,
    * id-asc order). The round-2 Dataset-`Aggregator` variant paid
    * case-class serde per row through ObjectHashAggregate; the native
    * aggregate updates primitive arrays in place and serializes only at
    * shuffle boundaries. */
  def bruteTopKAgg(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = prep(queries, idCol, vecCol, "query_id", "qv", "qn2")
    val c = prep(corpus, idCol, vecCol, "cand_id", "cv", "cn2")
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosFromNorms(dotFixed(col("qv"), col("cv")), col("qn2"), col("cn2"))
          .as("score"))
    val topk = org.apache.spark.sql.GraftSqlShims.column(
      graft.plans.TopKAgg(
        org.apache.spark.sql.GraftSqlShims.expression(col("cand_id")),
        org.apache.spark.sql.GraftSqlShims.expression(col("score")),
        k).toAggregateExpression())
    scored.groupBy(col("query_id")).agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("cand_id"),
        (col("pos") + 1).cast("int").as("rank"),
        round(col("col.score"), 6).as("cos_r"))
  }

  /** Deterministic sign-random-projection bucket id over `planes`
    * hyperplanes; plane p's weights are literal pseudo-random small ints
    * derived from StableHash.universalConst — reproducible anywhere.
    * One native dot product per plane. */
  def srpBucket(vecFixed: Column, dim: Int, planes: Int,
                planeOffset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val weights = (0 until dim).map { j =>
        graft.functions.StableHash
          .universalConst((planeOffset + p).toLong * dim + j) % 16 - 8
      }
      val w = typedLit(weights)
      when(dotFixed(vecFixed, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine over the union of SRP-bucket
    * collisions across `tables` disjoint hyperplane sets.
    *
    * A single SRP table keeps only candidates agreeing on ALL `planes`
    * sign bits — P(hit) = (1-θ/π)^planes, which for mid-angle true
    * neighbors is a recall collapse (measured 0.078 recall@10 on the
    * embeddings table with one 6-plane table; AnnRecallSpec). Multiple
    * independent tables union their collision sets:
    * P(hit) = 1-(1-(1-θ/π)^planes)^tables — 4 tables lift the same
    * corpus to 0.194 recall@10 (wide-angle synthetic neighbors; true
    * near-dups land near 1), and `tables` is the recall knob a user
    * turns, with scan cost linear in tables (monotonicity pinned in
    * AnnRecallSpec).
    *
    * Verify-once shape (same as [[nearDupPairsBlocked]]): candidate
    * generation carries only (tbl, bucket, id); (query, cand) pairs are
    * deduplicated ACROSS tables before any cosine work, then vectors
    * join back — a candidate colliding in all tables pays one dot
    * product. The query side (small by contract) is broadcast in both
    * the bucket join and the vector join-back; the corpus is scanned
    * once, exploded ×tables on narrow bucket keys.
    *
    * MULTIPROBE (`probeRadius = 1`): the query side ALSO probes every
    * bucket at Hamming distance 1 from its own — each single hyperplane
    * bit flipped — so a true neighbor that disagrees on exactly one of
    * `planes` sign bits is still found without adding tables (or any
    * corpus-side cost: the corpus index is untouched; only the
    * broadcast query build-side grows ×(planes+1)). Per-table hit
    * probability rises from p^planes to p^planes +
    * planes·p^(planes-1)(1-p) — the standard production recall knob
    * when memory rules out more tables. The probe set is a literal
    * XOR-mask expansion: deterministic, order-free (UNION-dedup
    * downstream), and fully inside whole-stage codegen. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int, k: Int,
                    planes: Int = 8, tables: Int = 4,
                    probeRadius: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      "probeRadius 0 (exact buckets) or 1 (all single-bit flips)")
    GraftFunctions.register(corpus.sparkSession)
    def keyed(df: DataFrame, outId: String,
              probe: Boolean = false): DataFrame = {
      // materialize each table's bucket as a named column FIRST, so the
      // probe expansion references it instead of duplicating the
      // planes x dim dot-product tree (planes+1)x per table
      val withB = df.select(col("id").as(outId) +:
        (0 until tables).map(tbl =>
          srpBucket(col("v"), dim, planes, tbl * planes).as(s"__b$tbl")): _*)
      val buckets = (0 until tables).flatMap { tbl =>
        val b = col(s"__b$tbl")
        val own = struct(lit(tbl).as("tbl"), b.as("bucket"))
        val flips =
          if (probe) (0 until planes).map(p =>
            struct(lit(tbl).as("tbl"),
              b.bitwiseXOR(lit(1L << p)).as("bucket")))
          else Nil
        own +: flips
      }
      withB.select(col(outId), explode(array(buckets: _*)).as("bk"))
        .select(col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"),
          col(outId))
    }
    val q = prep(queries, idCol, vecCol, "id", "v", "n2")
    val c = prep(corpus, idCol, vecCol, "id", "v", "n2")
    val candidates = keyed(c, "cand_id")
      .join(broadcast(keyed(q, "query_id", probe = probeRadius == 1)),
        Seq("tbl", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"))
      .distinct()
    val qv = q.select(col("id").as("query_id"), col("v").as("qv"),
      col("n2").as("qn2"))
    val cv = c.select(col("id").as("cand_id"), col("v").as("cv"),
      col("n2").as("cn2"))
    val scored = candidates.join(cv, Seq("cand_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos",
        cosFromNorms(dotFixed(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup).
    * Quadratic — use only behind blocking/LSH at scale; kept exact here
    * as the verification stage. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val a = prep(corpus, idCol, vecCol, "id_a", "va", "na2")
    val b = prep(corpus, idCol, vecCol, "id_b", "vb", "nb2")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        cosFromNorms(dotFixed(col("va"), col("vb")), col("na2"), col("nb2")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_r"))
  }

  /** SRP-blocked near-dup pairs — the scale twin of [[nearDupPairs]]:
    * `tables` independent sign-random-projection bucketings (disjoint
    * hyperplane sets via `planeOffset`), candidates = pairs sharing a
    * bucket in ANY table, verified by the exact fixed-point cosine.
    * Output ⊆ the exact all-pairs result; recall rises with `tables`
    * (P(hit) = 1-(1-(1-θ/π)^planes)^tables — near 1 for true near-dups,
    * e.g. ~95% at cos .95 with 6 planes x 4 tables; exact duplicates
    * are ALWAYS found, θ=0 shares every bucket). Shuffle volume:
    * tables x corpus on bucket keys, then bucket-local pairs — never
    * the O(n^2) of the exact verifier.
    *
    * Verify-once shape: candidate generation carries ONLY
    * (tbl, bucket, id) — the vectors never ride the pair expansion —
    * and candidate pairs are deduplicated ACROSS tables BEFORE any
    * cosine work, so a pair colliding in all `tables` bucketings pays
    * one dot product, not `tables`. Vectors are joined back onto the
    * deduplicated pairs (texts-last, the [[Dedup.jaccardVerifyPairs]]
    * shape); at scale those are two hash joins on the (small relative
    * to pair volume) prepped corpus.
    *
    * PRECONDITION: `idCol` must be unique in `corpus`. Pair dedup
    * happens on bare (id_a, id_b) BEFORE the vector join-back, so a
    * duplicated id would multiply pair rows by its vector count with
    * an arbitrary winner — run [[graft.operators.Dedup.exact]] on the
    * id first if uniqueness isn't guaranteed upstream. */
  def nearDupPairsBlocked(corpus: DataFrame, idCol: String, vecCol: String,
                          dim: Int, threshold: Double,
                          planes: Int = 6, tables: Int = 4): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val p = prep(corpus, idCol, vecCol, "id", "v", "n2")
    val buckets = (0 until tables).map { tbl =>
      struct(lit(tbl).as("tbl"),
        srpBucket(col("v"), dim, planes, tbl * planes).as("bucket"))
    }
    val keyed = p.select(col("id"), explode(array(buckets: _*)).as("bk"))
      .select(col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"),
        col("id"))
    val a = keyed.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val b = keyed.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val va = p.select(col("id").as("id_a"), col("v").as("va"),
      col("n2").as("na2"))
    val vb = p.select(col("id").as("id_b"), col("v").as("vb"),
      col("n2").as("nb2"))
    candidates.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos",
        cosFromNorms(dotFixed(col("va"), col("vb")), col("na2"), col("nb2")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_r"))
  }

  /** Per-group vector centroids (class prototypes) in exact fixed-point
    * arithmetic: for each (group, dimension) the vector count, exact
    * component sum, and truncated integer mean (Spark DIV == DuckDB //
    * for the oracle).
    *
    * Shape: posexplode is narrow; the (group, dim) aggregate is partial
    * map-side, so shuffle volume is O(groups x dim x partitions) — the
    * same update shape KMeans.fit uses per iteration, exposed as a
    * standalone operator for prototype/centroid analytics. */
  def groupedCentroids(df: DataFrame, groupCol: String,
                       vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(fixedPoint(col(vecCol)))
        .as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("x")).as("sum_fp"))
      .withColumn("mean_fp", expr("sum_fp DIV n_vecs"))

  /** Deterministic negative sampling for contrastive training: for
    * each anchor row, `k` pseudo-random negatives — rows with a
    * DIFFERENT label — chosen by salted-hash slot probing, without
    * ever materializing anchor x candidate pairs.
    *
    * Shape: candidates hash into `slots` buckets; ONE window pass
    * elects each (slot, label)'s min-hash representative (a tiny
    * slots x labels table); each anchor probes k hash-derived slots
    * and takes the min-hash other-label representative per probe. Work
    * is O(n + slots x labels + n x k x labels) through equi-joins on
    * the slot key — never the O(n^2) of "rank all other rows per
    * anchor". Sampling is with replacement across probes (two probes
    * can land the same representative); raise `slots` for diversity.
    * Fully deterministic given (data, salt): the engine-portable
    * StableHash drives both slot assignment and representative
    * election, so an oracle reproduces the exact sample. */
  def negativeSamples(df: DataFrame, idCol: String, labelCol: String,
                      k: Int, slots: Int, salt: String): DataFrame = {
    import graft.functions.StableHash
    val cand = df.select(col(idCol).as("cand_id"),
        col(labelCol).as("cand_label"))
      .withColumn("slot", StableHash.stable32(
        concat(col("cand_id").cast("string"), lit(salt))) % slots)
      .withColumn("h", StableHash.stable32(
        concat(lit("c"), col("cand_id").cast("string"))))
    val wRep = Window.partitionBy(col("slot"), col("cand_label"))
      .orderBy(col("h"), col("cand_id"))
    val reps = cand.withColumn("__rn", row_number().over(wRep))
      .filter(col("__rn") === 1)
      .select(col("slot"), col("cand_label"), col("cand_id"), col("h"))
    val anchors = df.select(col(idCol).as("anchor_id"),
        col(labelCol).as("anchor_label"))
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .withColumn("slot", StableHash.stable32(concat(
        col("anchor_id").cast("string"), lit("#"),
        col("i").cast("string"), lit(salt))) % slots)
    val wPick = Window.partitionBy(col("anchor_id"), col("i"))
      .orderBy(col("h"), col("cand_id"))
    anchors.join(reps, Seq("slot"))
      .filter(col("cand_label") =!= col("anchor_label"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("anchor_id"), col("i"),
        col("cand_id").as("neg_id"), col("cand_label").as("neg_label"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) re-expressed
    * relationally: partition the corpus by a k-means coarse quantizer,
    * then mark as semantic duplicates the rows whose cosine to a
    * LOWER-ID row of the SAME cluster meets `threshold` — the keeper of
    * every semantic-duplicate group is its lowest id, everything else
    * is flagged. Returns one row per corpus row: (id, cell, is_dup).
    *
    * Scale shape: the quadratic pair check runs WITHIN cells only —
    * one O(n) shuffle on the cell key, then per-cell m_c^2/2 local
    * pairs, so total pair work is n^2/k for balanced cells (the paper's
    * reason for clustering first; k grows with the corpus, holding
    * per-cell volume constant). The centroid matrix rides the plan as
    * a broadcast-sized literal; no driver collect of row data. Cells
    * with runaway m_c are the same hot-bucket failure mode as LSH
    * buckets — bound them upstream by raising k (cells track corpus
    * density, unlike hash buckets, so skew here means genuinely dense
    * semantic regions that SHOULD be deduped).
    *
    * `cents` comes from [[KMeans.fitOn]] — deterministic, so oracle SQL
    * can inline the same matrix and reproduce assignment bit-exactly.
    *
    * PRECONDITION: `idCol` unique (same contract as
    * [[nearDupPairsBlocked]] — a duplicated id multiplies its output
    * rows and pair checks); dedup ids upstream if not guaranteed. */
  def semDedup(cents: Array[Array[Long]], corpus: DataFrame, idCol: String,
               vecCol: String, threshold: Double): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val p = prep(corpus, idCol, vecCol, "id", "v", "n2")
      .withColumn("cell", KMeans.nearestCentroid(col("v"), col("n2"), cents))
    val a = p.select(col("cell"), col("id").as("id_a"), col("v").as("va"),
      col("n2").as("na2"))
    val b = p.select(col("cell"), col("id").as("id_b"), col("v").as("vb"),
      col("n2").as("nb2"))
    val dupIds = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosFromNorms(dotFixed(col("va"), col("vb")),
        col("na2"), col("nb2")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    p.select(col("id"), col("cell"))
      .join(dupIds.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }
}
