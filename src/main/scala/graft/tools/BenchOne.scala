package graft.tools

import org.apache.spark.sql.SparkSession

/** Local single-query timing harness: same protocol as [[graft.Bench]]
  * (local[32], warm-up + min of three) for one or more named queries —
  * the fast iteration loop for per-query perf work.
  * Usage: runMain graft.tools.BenchOne <sfDir> <query>[,<query>...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions",
        "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        // toRdd.count: force every output column (same protocol as
        // Bench — plain count() lets join elimination skip the work)
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val runs = Seq(once(), once(), once())
      println(f"[benchone] $name min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
