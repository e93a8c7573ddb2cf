package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides pre-bucketed on the join key
  * must SortMergeJoin with ZERO exchanges — the "pay the shuffle once
  * at write time" scale pattern q_bucketed_join demonstrates. */
class BucketedSpec extends SparkSpec {

  test("bucketed-bucketed join plans no Exchange") {
    val (o, c) = QueriesPipeline.bucketedTables(spark, sfDir)
    val joined = o.hint("merge")
      .join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
    // and the result matches the plain parquet join
    val expected = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected)
  }
}
