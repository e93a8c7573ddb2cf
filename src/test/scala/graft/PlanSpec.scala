package graft

/** Physical-plan assertions: the plans must stay the plans we designed
  * for scale, not merely produce correct rows (SURVEY.md §4).
  */
class PlanSpec extends SparkSpec {

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("filter+projection reach the parquet scan (pushdown + pruning)") {
    val plan = executedPlan("q_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(plan.contains("o_orderstatus"), "filter must be pushed")
    // column pruning: scan must not read o_orderdate
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_orderdate"), readSchema)
  }

  test("fact x dim join broadcasts the dim side, no shuffle of the fact") {
    val plan = executedPlan("q_join_broadcast_left")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("grouped aggregation is partial (map-side) then final") {
    val plan = executedPlan("q_pricing_summary")
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n${plan.take(800)}")
  }

  test("similarity scoring uses the native codegen'd dot product") {
    val plan = executedPlan("q_ann_brute_topk")
    assert(plan.contains("graft_dot_long"), plan.take(1200))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query side must be broadcast")
  }

  test("top-k after sort is a distributed TakeOrdered, not a global sort") {
    val plan = executedPlan("q_shipping_priority")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("star join broadcasts every dimension (single fact pipeline)") {
    val plan = executedPlan("q_local_supplier_volume")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 5,
      plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("semi/anti joins stay joins (no subquery materialization)") {
    assert(executedPlan("q_semi_join").contains("LeftSemi"))
    assert(executedPlan("q_anti_join").contains("LeftAnti"))
  }

  test("range join query plans as an equi-join (no nested loop at any SF)") {
    val plan = executedPlan("q_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("curation pipeline is narrow except the dedup-key window") {
    val plan = executedPlan("q_curation_pipeline")
    // one exchange for the window on text; no join anywhere
    assert(!plan.contains("Join"), plan.take(1200))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n${plan.take(1500)}")
  }

  test("tfidf broadcasts the corpus-count side, not the tf side") {
    val plan = executedPlan("q_tfidf_top_terms")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1200))
  }

  test("all graft native functions are SQL-callable after registration") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot_long(array(1L,2L), array(3L,4L)) AS d,
        |  graft_minhash(graft_shingle_hash32('abcdef', 3), 4) AS mh,
        |  graft_word_shingles('a b c', 2) AS ws,
        |  graft_simhash32('hello world') AS sh""".stripMargin).head()
    assert(r.getLong(0) == 11L)
    assert(r.getSeq[Long](1).length == 4)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
  }

  test("GraftExtensions injects the same function set (cluster deploy path)") {
    // the extension and the runtime registry share GraftFunctions.builders,
    // so applying it to a fresh extensions container must not throw and
    // must cover every name register() installs
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    assert(graft.plans.GraftFunctions.builders.map(_._1).toSet ==
      Set("graft_dot_long", "graft_minhash", "graft_shingle_hash32",
        "graft_word_shingles", "graft_simhash32", "graft_nearest_centroid",
        "graft_word_jaccard", "graft_dup_stats", "graft_nfc",
        "graft_wordpiece"))
  }

  test("whole-stage codegen covers the narrow transform pipeline") {
    val plan = executedPlan("q_cast_when_repair")
    // whole-stage codegen spans print as "*(n) Operator"
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      plan.take(800))
  }
}
