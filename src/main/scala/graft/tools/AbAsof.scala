package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Scratch A/B: native AsofJoinExec vs union+window composition. */
object AbAsof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def e = graft.Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
    def purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    def signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"), col("ts_us").as("signup_us"))
    def native() = AsOf.asofJoinNative(purchases, signups, "user_id", "ts_us",
      Seq("signup_us"))
    def composed() = AsOf.asofJoin(purchases, signups, "user_id", "ts_us",
      Seq("signup_us"))
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    time(native); time(composed)
    val n = (1 to 3).map(_ => time(native))
    val c = (1 to 3).map(_ => time(composed))
    println(f"[ab] native:   min=${n.min}%.3f all=${n.map(x => f"$x%.2f").mkString(",")}")
    println(f"[ab] composed: min=${c.min}%.3f all=${c.map(x => f"$x%.2f").mkString(",")}")
    println("[ab] rows native=" + native().count() + " composed=" + composed().count())
    spark.stop()
  }
}
