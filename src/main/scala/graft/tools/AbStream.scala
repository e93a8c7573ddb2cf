package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B: streaming hourly rollup cost vs state-store partition
  * count (not library surface). */
object AbStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var n = 0
    def run(parts: Int): Double = {
      n += 1
      val t0 = System.nanoTime()
      // statePartitions passed explicitly — hourlyRollup's own default
      // would otherwise override whatever we are trying to measure
      graft.streaming.EventStream.hourlyRollup(spark, dir,
        queryName = s"ab_hourly_$n",
        statePartitions = Some(parts)).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(32); run(8) // warm both paths
    val t32 = (1 to 3).map(_ => run(32))
    val t8 = (1 to 3).map(_ => run(8))
    val t4 = (1 to 3).map(_ => run(4))
    println(f"[ab] parts=32 min=${t32.min}%.3f all=${t32.map(x => f"$x%.2f").mkString(",")}")
    println(f"[ab] parts=8  min=${t8.min}%.3f all=${t8.map(x => f"$x%.2f").mkString(",")}")
    println(f"[ab] parts=4  min=${t4.min}%.3f all=${t4.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
