package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueriesML.{MinhashBands, MinhashK, ShingleN}
import graft.operators.Dedup

/** Scratch stage-timing for the minhash+LSH pipeline (not library
  * surface): where do the 2.3s at sf0.1 actually go? */
object AbMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = graft.Tables.load(spark, dir, "documents")
    def sigs = Dedup.minhashSignatures(docs, "doc_id", "text", ShingleN, MinhashK)
    def bands = Dedup.lshBands(sigs, "doc_id", MinhashK, MinhashBands)
    def cands = Dedup.minhashCandidates(docs, "doc_id", "text", ShingleN,
      MinhashK, MinhashBands)
    def time(label: String, f: () => DataFrame): Unit = {
      f().count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label%-12s min=${ts.min}%.3f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    // variant A: flat self-join on (band, band_key)
    def candsJoin() = {
      val b = bands
      val l = b.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
      val r = b.select(col("band"), col("band_key"), col("doc_id").as("id_b"))
      l.join(r, Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    // variant B: bucket collect + double explode
    def candsExpl() = {
      val buckets = bands.groupBy(col("band"), col("band_key"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
      buckets.select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .filter(col("id_a") < col("id_b")).distinct()
    }
    // variant C: repartition between the explodes to spread hot buckets
    def candsRepart() = {
      val buckets = bands.groupBy(col("band"), col("band_key"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
      buckets.select(explode(col("ids")).as("id_a"), col("ids"))
        .repartition(32)
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .filter(col("id_a") < col("id_b")).distinct()
    }
    time("cands", cands _)
    time("candsRepart", candsRepart _)
    println("[ab] rows cands=" + cands.count()
      + " repart=" + candsRepart().count())
    spark.stop()
  }
}
