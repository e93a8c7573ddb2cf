package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (Spark's runtime filtering): a
  * selective filter on the dimension side is converted into a bloom
  * filter applied to the fact scan BEFORE the join shuffle — at 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction. Thresholds are lowered to make the
  * optimizer fire on test-scale data; on a real cluster the defaults
  * (10 MB creation side) do the right thing.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // the rule only fires for joins that will SHUFFLE — a dim small
      // enough to broadcast doesn't need (or get) a bloom filter, so
      // force the shuffle path the way a 100 TB fact×large-dim join hits it
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.load(spark, sfDir, "lineitem")
      val dim = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      // force a shuffle join: bloom filters target shuffle-side scans
      val joined = fact.hint("merge")
        .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter in:\n$plan")
      val got = joined.count()
      // parity baseline computed with the rewrite DISABLED — otherwise
      // the un-hinted join is bloom-filtered too and a row-dropping
      // filter defect would cancel out of the comparison
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(got == expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
