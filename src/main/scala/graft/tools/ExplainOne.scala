package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named gate queries — the
  * plan-audit loop (PERF.md entries cite its output). Usage:
  * runMain graft.tools.ExplainOne <sfDir> <q1,q2,...> */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions",
        "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
