package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug/A-B harness for the sketch-merge invariant: prints, per
  * event_type at the given SF, the exact distinct count and the HLL
  * estimate through three paths — union of per-day partials, union of
  * one whole-group sketch, and the directly-streamed sketch — to
  * pin down which paths agree (DataSketches applies HIP vs composite
  * estimators depending on how a sketch was produced).
  * Usage: runMain graft.tools.AbSketch <sfDir>
  */
object AbSketch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.load(spark, dir, "events")
      .withColumn("day", expr("ts_ns DIV 86400000000000"))
    val partials = graft.operators.Sketches.hllPartial(e,
      Seq("event_type", "day"), "user_id")
    val merged = graft.operators.Sketches.hllMerge(partials, Seq("event_type"))
      .withColumnRenamed("approx_distinct", "est_merged")
    val whole = graft.operators.Sketches.hllPartial(e, Seq("event_type"), "user_id")
    val wholeUnion = graft.operators.Sketches.hllMerge(whole, Seq("event_type"))
      .withColumnRenamed("approx_distinct", "est_whole_union")
    val direct = e.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est_direct"),
        countDistinct(col("user_id")).as("n_exact"))
    merged.join(wholeUnion, "event_type").join(direct, "event_type")
      .orderBy("event_type")
      .collect()
      .foreach(r => println(s"[absketch] ${r.mkString(" | ")}"))
    spark.stop()
  }
}
