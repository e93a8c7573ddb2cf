package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: LSH bucket-size distribution at sf0.1 (skew check). */
object AbBuckets {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text",
      graft.QueriesML.ShingleN, graft.QueriesML.MinhashK)
    val bands = graft.operators.Dedup.lshBands(sigs, "doc_id",
      graft.QueriesML.MinhashK, graft.QueriesML.MinhashBands)
    val sizes = bands.groupBy("band", "band_key").count()
      .filter(col("count") > 1)
    println("[ab] buckets>1: " + sizes.count())
    sizes.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"[ab] top bucket size=${r.getLong(2)}"))
    val pairsPerBucket = sizes.withColumn("pairs",
      col("count") * (col("count") - 1) / 2)
    println("[ab] total pre-distinct pairs: " +
      pairsPerBucket.agg(sum("pairs")).head.get(0))
    spark.stop()
  }
}
