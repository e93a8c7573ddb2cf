package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Minimal deterministic Lloyd's k-means over embedding columns, and an
  * IVF-style ANN built on it (coarse quantizer -> probe nearest cells).
  *
  * Design for scale:
  *  - each iteration is ONE distributed pass: assignment is a codegen'd
  *    argmin over k broadcast centroid dot-products (no UDF, no
  *    crossJoin), the centroid update is posexplode + groupBy(cluster,
  *    dim) partial-aggregated means — shuffle volume O(k x dim x
  *    partitions);
  *  - centroids live on the driver between iterations (k x dim doubles
  *    — trivially small), baked into the next plan as literals;
  *  - deterministic: init = first k vectors by id, fixed-point vector
  *    arithmetic, exact integer sums in the mean update.
  *
  * IVF search: corpus rows are indexed by nearest centroid (the
  * "inverted file"); a query scans only its `nprobe` nearest cells —
  * the 100 TB alternative to a full scan, recall traded via nprobe.
  */
object KMeans {

  /** Squared L2 distance of a fixed-point vector column to a centroid
    * literal, expanded as |x|^2 - 2<x,c> + |c|^2 with the cross term as
    * exact integer arithmetic over scaled centroids. All terms exact
    * ints -> deterministic. `cScaled` is the centroid rounded back to
    * fixed-point longs. */
  private def sqDistToCentroid(xFixed: Column, xNorm2: Column,
                               cScaled: Array[Long]): Column = {
    val cLit = typedLit(cScaled.toSeq)
    val cross = call_function(GraftFunctions.DotLongName, xFixed, cLit)
    val cNorm2 = cScaled.map(v => v * v).sum
    // |c|^2 rides in a 1-element ARRAY literal: array literals land in
    // the codegen references array (a scalar literal is inlined in the
    // generated source), so the source is byte-identical across fit
    // iterations -> janino cache hit instead of a recompile per round
    xNorm2 - lit(2L) * cross + element_at(typedLit(Seq(cNorm2)), 1)
  }

  /** Cluster id of the nearest centroid (ties -> lowest id): one fused
    * codegen'd expression over the centroid matrix literal
    * (plans.NearestCentroid). The earlier least(struct(dist,i)...)
    * forest was correct but Catalyst re-analyzed its 16-branch tree on
    * every Lloyd iteration — plan-build time dominated the job. */
  def nearestCentroid(xFixed: Column, xNorm2: Column,
                      centroids: Array[Array[Long]]): Column =
    call_function(GraftFunctions.NearestCentroidName, xFixed,
      typedLit(centroids.map(_.toIndexedSeq).toIndexedSeq))

  /** Prepared frame: (id, v: array<long> fixed-point, n2: |v|^2). */
  def prepare(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), Similarity.fixedPoint(col(vecCol)).as("v"))
      .withColumn("n2", call_function(GraftFunctions.DotLongName, col("v"), col("v")))
  }

  /** Lloyd's iterations; returns centroids as fixed-point longs.
    * Init: the k lowest-id vectors (deterministic, reproducible). */
  def fit(prepared: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    var centroids: Array[Array[Long]] = prepared.orderBy("id").limit(k)
      .select("v").collect()
      .map(_.getSeq[Long](0).toArray)
    val dim = centroids.head.length
    for (_ <- 0 until iters) {
      val assigned = prepared.withColumn("c",
        nearestCentroid(col("v"), col("n2"), centroids))
      // exact integer sums per cluster, one column per dimension: all
      // partial-aggregated map-side, shuffle = k rows x (dim+1) longs —
      // vs posexplode's rows x dim shuffle of (cluster, dim, x) triples
      val aggs = (0 until dim).map(j =>
        sum(element_at(col("v"), j + 1)).as(s"s$j")) :+ count(lit(1)).as("n")
      val sums = assigned.groupBy(col("c")).agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(dim + 1)
        var d = 0
        while (d < dim) {
          next(c)(d) = math.round(r.getLong(d + 1).toDouble / n)
          d += 1
        }
      }
      centroids = next
    }
    centroids
  }

  /** Fit on a corpus column: prepare, cache for the fit's iters+1
    * actions, release. Returns the fixed-point centroid matrix —
    * deterministic given the data, so callers may regenerate it (e.g.
    * to inline into engine-portable oracle SQL). */
  def fitOn(corpus: DataFrame, idCol: String, vecCol: String,
            clusters: Int, iters: Int): Array[Array[Long]] = {
    // fit runs iters+1 actions over the prepared frame — cache for its
    // duration, then release: fit's actions are eager, so the benefit
    // is fully realized before unpersist, and a long-lived session
    // doesn't pin the corpus in storage memory. The single lazy index
    // scan afterwards re-reads the source once.
    val cached = prepare(corpus, idCol, vecCol).cache()
    try fit(cached, clusters, iters)
    finally cached.unpersist()
  }

  /** IVF ANN: index corpus rows by nearest centroid; per query, probe
    * the `nprobe` nearest cells and rank exact cosine inside them. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, clusters: Int = 16,
              iters: Int = 3, nprobe: Int = 2): DataFrame =
    ivfTopKWith(fitOn(corpus, idCol, vecCol, clusters, iters),
      corpus, queries, idCol, vecCol, k, nprobe)

  /** Per-row PROBE CELLS: the `nprobe` nearest centroid ids of a
    * prepared row (expects columns `v`, `n2`), exploded — ties break
    * toward the lower cell id via the (d, i) struct sort, matching
    * [[nearestCentroid]]'s assignment tie rule. */
  def probeCells(cents: Array[Array[Long]], nprobe: Int): Column = {
    val ds = array(cents.indices.map(i =>
      struct(sqDistToCentroid(col("v"), col("n2"), cents(i)).as("d"),
        lit(i).as("i"))): _*)
    explode(slice(transform(array_sort(ds), p => p.getField("i")),
      1, nprobe))
  }

  /** IVF search against an already-fitted centroid matrix. */
  def ivfTopKWith(cents: Array[Array[Long]], corpus: DataFrame,
                  queries: DataFrame, idCol: String, vecCol: String,
                  k: Int, nprobe: Int): DataFrame = {
    val c = prepare(corpus, idCol, vecCol)
    val indexed = c.withColumn("cell",
      nearestCentroid(col("v"), col("n2"), cents))
      .withColumnRenamed("id", "cand_id")
      .withColumnRenamed("v", "cv").withColumnRenamed("n2", "cn2")
    val q = prepare(queries, idCol, vecCol)
    val qProbed = q
      .withColumn("cell", probeCells(cents, nprobe))
      .withColumnRenamed("id", "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("n2", "qn2")
    import org.apache.spark.sql.expressions.Window
    val scored = indexed.join(broadcast(qProbed), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos",
        call_function(GraftFunctions.DotLongName, col("qv"), col("cv"))
          .cast("double") /
          sqrt(col("qn2").cast("double") * col("cn2").cast("double")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cos"), 6).as("cos_r"))
  }
}
