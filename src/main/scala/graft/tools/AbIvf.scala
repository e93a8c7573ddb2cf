package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Scratch stage-timing for the IVF ANN pipeline (not library surface). */
object AbIvf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def emb = graft.Tables.load(spark, dir, "embeddings")
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label%-14s min=${ts.min}%.3f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    t("prepare+count") { KMeans.prepare(emb, "vec_id", "embedding").count() }
    t("fit(16,3)") {
      val c = KMeans.prepare(emb, "vec_id", "embedding").cache()
      KMeans.fit(c, 16, 3)
      c.unpersist()
    }
    t("full ivfTopK") {
      KMeans.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", 3, clusters = 16, iters = 3, nprobe = 4).count()
    }
    spark.stop()
  }
}
