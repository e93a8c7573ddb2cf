package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism design: embeddings are converted to FIXED-POINT integers
  * (round(x * 2^20) as long). Dot products and norms then stay exact
  * (64 dims x (2^20)^2 products < 2^53), so cosine similarity is
  * bit-identical in every engine regardless of summation order — the
  * reason ANN results here can be hash-compared against a SQL oracle.
  *
  * Scale design:
  *  - [[bruteTopK]]: score = broadcast(queries) x corpus — a narrow map
  *    stage over the corpus (no corpus shuffle); the top-k cut shuffles
  *    only the scored (query, cand) rows. For huge corpora the ranking
  *    shuffle is the bottleneck: cut per-partition first (see
  *    `partialTopK` note) or use the LSH route.
  *  - [[lshBucketTopK]]: sign-random-projection buckets; each corpus row
  *    lands in one bucket per table, candidates = same-bucket rows only.
  *    Hyperplanes are derived deterministically from StableHash so the
  *    index is reproducible.
  */
object Similarity {

  val Scale: Long = 1L << 20

  /** array<float> -> array<bigint> fixed-point. */
  def fixedPoint(c: Column): Column =
    transform(c, x => round(x * lit(Scale.toDouble)).cast("long"))

  /** Exact integer dot product of two fixed-point vectors. */
  def dotFixed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from fixed-point vectors (deterministic). */
  def cosineFixed(a: Column, b: Column): Column =
    dotFixed(a, b).cast("double") /
      sqrt(dotFixed(a, a).cast("double") * dotFixed(b, b).cast("double"))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast). Self-pairs excluded. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      fixedPoint(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"),
      fixedPoint(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosineFixed(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Deterministic sign-random-projection bucket id over `planes`
    * hyperplanes; plane p component j = universal hash of (p*dim+j)
    * mapped to a small signed integer — reproducible anywhere. */
  def srpBucket(vecFixed: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // pseudo-random signed weights in [-8, 8): ((h % 16) - 8)
      val dot = (0 until dim).map { j =>
        val h = graft.functions.StableHash.universalConst(p.toLong * dim + j)
        element_at(vecFixed, j + 1) * lit(h % 16 - 8)
      }.reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine within matching SRP buckets only.
    * Recall < 1 by construction; at 100 TB this replaces the full
    * corpus scan per query with a bucket-local scan. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int, k: Int,
                    planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        fixedPoint(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), dim, planes))
    val c = corpus.select(col(idCol).as("cand_id"),
        fixedPoint(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), dim, planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosineFixed(col("qv"), col("cv")))
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
    val a = corpus.select(col(idCol).as("id_a"),
      fixedPoint(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"),
      fixedPoint(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineFixed(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_r"))
  }
}
