package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR at local[32], prints ONE JSON line.
  *
  * Each query gets a warm-up execution (codegen compile, JIT, file
  * metadata caches) followed by the measured execution — steady-state
  * numbers, which is what a long-running cluster job actually sees.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed query records -1, never a green-looking elapsed time
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
          -1.0
        }
      }
      once() // warm-up (codegen/JIT/file-index caches)
      // min of three measured runs: the box is shared, and observed
      // cross-run noise on identical code is +-40% — min approximates
      // the uncontended cost
      val runs = Seq(once(), once(), once())
      // cross-query hygiene (outside the timed window): drop leftover
      // temp views (streaming memory sinks accumulate one per run) and
      // collect garbage so a query's debris never bills its successors
      spark.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      System.gc()
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
