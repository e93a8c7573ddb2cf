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
    tri.crossJoin(wedges)
  }
}
