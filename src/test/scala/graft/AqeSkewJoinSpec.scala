package graft

import org.apache.spark.sql.functions._

/** AQE skew-join demonstrated end to end: the runtime alternative to
  * [[graft.operators.ScaleOps.saltedJoin]] for skewed join keys. With
  * `spark.sql.adaptive.skewJoin` on, AQE inspects the ACTUAL shuffle
  * map sizes at runtime and splits a hot partition into several
  * sub-reads, each re-joined against a replicated build side — the
  * same replicate-×-split trade as salting, decided from measured
  * sizes instead of a hand-tuned salt width. Result parity with the
  * plain join and with saltedJoin is asserted; the executed (adaptive,
  * final) plan must carry the `isSkew=true` marking on the split
  * partition reads.
  *
  * Salting remains the right tool when AQE can't see the skew (a
  * skewed AGGREGATION, or a broadcast-ineligible build side under a
  * join type AQE won't split); this spec documents the decision
  * boundary the key-skew profiler (`Stats.keySkew`) feeds.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition at runtime; results identical") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // small thresholds so a test-sized hot key qualifies as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // force the shuffle-join path: broadcast would hide the skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key owning ~97% of the fact rows
      val fact = spark.range(0, 200000L)
        .select(when(col("id") % 30 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"),
          concat(lit("payload-"), col("id")).as(s"pad"))
      val dim = spark.range(0, 30000L)
        .select(col("id").as("k"), (col("id") * 3).as("dval"))
      // max(pad) keeps the per-row payload strings flowing through the
      // fact shuffle — otherwise column pruning + the constant hot key
      // compress the partition below any realistic skew threshold
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("cnt"), sum(col("dval")).as("s"),
          max(col("pad")).as("ignore"))
      val row = joined.collect()(0)
      val got = (row.getLong(0), row.getLong(1))
      // the SAME QueryExecution, read after execution → the final
      // adaptive plan, with skew markings if AQE split anything
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"AQE must mark the split hot partition, got:\n$plan")
      // parity: the salted twin must agree exactly
      val salted = graft.operators.ScaleOps
        .saltedJoin(fact, dim, "k", salts = 8)
        .agg(count(lit(1)), sum(col("dval"))).as[(Long, Long)].head()
      assert(salted == got, "saltedJoin must agree with the AQE split join")
      assert(got._1 > 190000L, s"hot key must dominate the join: $got")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
