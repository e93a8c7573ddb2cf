package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the companion to
  * [[Dedup.minLabelClusters]] for analyzing near-dup graph structure
  * (cluster density, boilerplate detection: a shingle-spam corpus
  * shows up as abnormally high triangle closure).
  */
object Graph {

  /** Exact triangle and wedge counts of the undirected simple graph
    * induced by `edges` (self-loops and duplicate/reversed edges
    * collapse). One row: (n_triangles, n_wedges) — their ratio
    * 3T/W is the global clustering coefficient, left to the caller so
    * the output stays exact-integer.
    *
    * Scale shape — degree-ordered orientation (the standard
    * compact-forward algorithm): every edge is directed from its
    * lower-(degree, id) endpoint, so each vertex's OUT-degree is
    * O(sqrt(2m)) no matter how skewed the in-degrees are, and the
    * wedge self-join (the quadratic step) does sum(outdeg^2) =
    * O(m^1.5) work instead of sum(deg^2) — which a single
    * celebrity-node corpus would otherwise blow up. All joins are
    * key-partitioned equi-joins; no driver state.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persist: the edge set is referenced five times below (degree
    // union x2, orientation join, and the oriented frame three more
    // times); an expensive edges lineage (LSH candidates) would be
    // re-evaluated per reference otherwise. Edge/degree/oriented rows
    // are a few longs each — O(m), tiny next to the corpus.
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(mem)
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .persist(mem)
    // unordered wedges (paths of length 2): sum over nodes of C(d, 2)
    val wedges = deg.agg(
      coalesce(sum(expr("(d * (d - 1)) DIV 2")), lit(0L)).as("n_wedges"))
    // orient u -> v iff (deg(u), u) < (deg(v), v): a total order, so
    // the oriented graph is acyclic with bounded out-degree
    val du = deg.select(col("n").as("u"), struct(col("d"), col("n")).as("ku"))
    val dv = deg.select(col("n").as("v"), struct(col("d"), col("n")).as("kv"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("dk"))
      .persist(mem)
    // wedge (x, y) out of src, ordered by the SAME total order — the
    // closing edge {x, y}, if present, is oriented exactly x -> y
    val o1 = oriented.select(col("src"), col("dst").as("x"), col("dk").as("kx"))
    val o2 = oriented.select(col("src"), col("dst").as("y"), col("dk").as("ky"))
    val closing = oriented.select(col("src").as("x"), col("dst").as("y"))
    val tri = o1.join(o2, Seq("src")).filter(col("kx") < col("ky"))
      .join(closing, Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    // The output is ONE row of two counts: realize it eagerly so the
    // three O(m) persisted intermediates can be released immediately
    // instead of living until session end (collect of a single
    // aggregate row is driver-safe at any scale).
    val result = tri.crossJoin(wedges)
    val rows = result.collect()
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    edges.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") — the TRUE-fixpoint companion to
    * [[Dedup.minLabelClusters]], whose K-round contract only reaches
    * the component minimum on graphs of diameter <= K. Star
    * contraction converges in O(log^2 n) rounds on ANY diameter (a
    * 10^6-node path needs ~40 rounds, not 10^6), which is the
    * difference between "near-dup clusters" (tiny diameters, K rounds
    * fine) and arbitrary graphs (reply chains, link graphs).
    *
    *   large-star(u): connect every STRICTLY LARGER neighbor of u to
    *     m(u) = min(neighbors(u) ∪ {u})
    *   small-star(u): orient edges large→small; connect every smaller
    *     neighbor (and u) to the minimum among them
    *
    * Each half-round is one map-side-combined reduceByKey (per-node
    * min — a supernode's million edges collapse to one partial per
    * upstream partition) plus one co-partitioned join — O(m) shuffle,
    * no driver state beyond the per-round convergence check (count +
    * two independent hash sums, one tiny action). At the fixpoint the
    * edge set IS the component stars: every node is directly adjacent
    * to its component minimum.
    *
    * Output matches minLabelClusters: (id, cluster = component min id,
    * keep = id == cluster); isolated ids are their own cluster.
    */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
                          aCol: String, bCol: String,
                          maxRounds: Int = 50): DataFrame = {
    val spark = ids.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val idRows = ids.select(col(idCol).cast("long")).queryExecution.toRdd
      .map(_.getLong(0))
    val part = new org.apache.spark.HashPartitioner(
      math.max(idRows.getNumPartitions, 2))
    type E = org.apache.spark.rdd.RDD[(Long, Long)]
    var edges: E = pairs.select(col(aCol).cast("long"),
        col(bCol).cast("long")).queryExecution.toRdd
      .map(ir => (ir.getLong(0), ir.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct()
      .persist(lvl)

    // min over (neighbors(u) ∪ {u}) for the supplied adjacency view
    def minTo(nbrs: E): E =
      nbrs.map { case (u, v) => (u, math.min(u, v)) }
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))

    def largeStar(e: E): E = {
      val nbrs = e.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
        .partitionBy(part)
      // the mid-round distinct is load-bearing on DENSE graphs: a
      // degree-d node whose neighbors share one min yields d duplicate
      // (v, m) rows, and distinct's map-side combine collapses them
      // before the shuffle (measured on the 1.77M-edge near-dup graph:
      // removing it cost +19%)
      nbrs.join(minTo(nbrs)) // narrow: same partitioner
        .flatMap { case (u, (v, m)) => if (v > u) Iterator((v, m)) else Iterator.empty }
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct()
    }

    def smallStar(e: E): E = {
      // orient large -> small: (h, l) with l < h
      val dir = e.map { case (a, b) => (math.max(a, b), math.min(a, b)) }
        .partitionBy(part)
      dir.join(minTo(dir)) // narrow: same partitioner
        .flatMap { case (h, (l, m)) => Iterator((l, m), (h, m)) }
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct()
    }

    // convergence signature: count plus two independent hash sums —
    // O(1) driver state per round
    def sig(e: E): (Long, Long, Long) =
      e.map { case (a, b) =>
        (1L, a * 1000003L + b, a * 2147483629L ^ (b + 40503L))
      }.fold((0L, 0L, 0L)) { (x, y) =>
        (x._1 + y._1, x._2 + y._2, x._3 ^ y._3)
      }

    var s = sig(edges)
    var r = 0
    var done = edges.isEmpty()
    while (!done && r < maxRounds) {
      val next = smallStar(largeStar(edges)).persist(lvl)
      val ns = sig(next)
      edges.unpersist(blocking = false)
      edges = next
      done = ns == s
      s = ns
      r += 1
    }
    // an "exact" operator must not silently return K-round labels the
    // way minLabelClusters' bounded contract does: alternation
    // converges in O(log^2 n) rounds w.h.p. (the 400-node-path spec
    // needs ~9), so hitting the cap means something is genuinely wrong
    require(done, s"star contraction did not converge in $maxRounds " +
      "rounds - raise maxRounds (O(log^2 n) expected)")
    // at the fixpoint every node is adjacent to its component min
    val lbl = edges.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
      .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      .map { case (u, m) => (u, math.min(u, m)) }
    val labeled = idRows.map(id => (id, ()))
      .partitionBy(part)
      .leftOuterJoin(lbl)
      .map { case (id, (_, m)) => (id, m.getOrElse(id)) }
    val labeledFinal = labeled.localCheckpoint()
    labeledFinal.count()
    edges.unpersist(blocking = false)
    val out = labeledFinal.map { case (id, c) =>
      org.apache.spark.sql.Row(id, c, id == c) }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      ids.select(col(idCol)).schema.head,
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("keep",
        org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** Exact-integer PageRank over the undirected graph induced by
    * `pairs`, `iterations` synchronous rounds in e9 fixed-point:
    *
    *   pr_0(v)   = 1e9  (unnormalized; sums to nodes x 1e9)
    *   pr_k+1(v) = (1e9 x (den-num)) DIV den
    *             + (num x sum_{u->v} (pr_k(u) DIV outdeg(u))) DIV den
    *
    * with damping num/den (default 85/100). Every operation is integer
    * (DIV truncates), so the scores are bit-identical in any engine
    * and the hash gate is exact — float PageRank can only ever be
    * compared with tolerance. Isolated nodes keep the (1-d) base;
    * there are no other dangling nodes in an undirected graph. Long
    * arithmetic holds while nodes x 1e9 x num < 2^63 (~1e8 nodes at
    * num=85); shift the fixed point down or go DECIMAL beyond that.
    *
    * Execution is the same Pregel RDD shape as
    * [[Dedup.minLabelClusters]]: edges (with out-degree precomputed)
    * and scores hash-partitioned ONCE on the same partitioner, each
    * round = narrow co-partitioned join + one map-side-combined
    * reduceByKey shuffle of O(nodes) contribution sums + narrow left
    * join — constant-size lineage, no per-round plan compile. Unlike
    * min-label there is no delta trick: every node re-emits every
    * round (scores keep changing), which is why iterations is a
    * bounded knob, not a convergence loop.
    *
    * `pairs` must be distinct undirected pairs (the dedup candidate
    * operators' output shape); duplicates would double-count edges.
    */
  def pageRank(ids: DataFrame, idCol: String, pairs: DataFrame,
               aCol: String, bCol: String, iterations: Int,
               dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iterations >= 0 && dampDen > 0 && dampNum >= 0 &&
      dampNum <= dampDen, "need 0 <= dampNum <= dampDen")
    val spark = ids.sparkSession
    val base = 1000000000L * (dampDen - dampNum) / dampDen
    val edgeRows = pairs.select(col(aCol).cast("long"),
      col(bCol).cast("long")).queryExecution.toRdd
      .map(ir => (ir.getLong(0), ir.getLong(1)))
    val idRows = ids.select(col(idCol).cast("long")).queryExecution.toRdd
      .map(ir => ir.getLong(0))
    val part = new org.apache.spark.HashPartitioner(
      math.max(edgeRows.getNumPartitions, idRows.getNumPartitions))
    val edges = edgeRows
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part)
    val outdeg = edges.mapValues(_ => 1L)
      .reduceByKey(part, (a: Long, b: Long) => a + b)
    // (src, (dst, outdeg(src))) — degree joined ONCE, then reused
    val edgesWithDeg = edges.join(outdeg) // narrow: same partitioner
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pr = idRows.map(id => (id, 1000000000L)).partitionBy(part)
    for (_ <- 0 until iterations) {
      val contrib = edgesWithDeg.join(pr) // narrow: same partitioner
        .map { case (_, ((dst, deg), p)) => (dst, p / deg) }
        .reduceByKey(part, (a: Long, b: Long) => a + b)
      pr = pr.leftOuterJoin(contrib) // narrow: same partitioner
        .mapValues { case (_, s) =>
          base + dampNum * s.getOrElse(0L) / dampDen }
    }
    // Truncate the K-round lineage to the O(nodes) final scores and
    // release the edge working set — same session hygiene as
    // [[Dedup.minLabelClusters]]: without it every pageRank call
    // leaves an O(m) block-store footprint for the session lifetime.
    val prFinal = pr.localCheckpoint()
    prFinal.count()
    edgesWithDeg.unpersist(blocking = false)
    val out = prFinal.map { case (id, p) => org.apache.spark.sql.Row(id, p) }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      ids.select(col(idCol)).schema.head,
      org.apache.spark.sql.types.StructField("pr_e9",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
