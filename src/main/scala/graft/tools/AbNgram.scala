package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch A/B harness for the n-gram Jaccard hot path (not part of the
  * library surface). Compares the shipped kernel-shingled self-join
  * against the fully declarative round-1 formulation, interleaved in
  * one JVM to cancel host noise, and asserts kernel/declarative shingle
  * parity on the real table. */
object AbNgram {

  def declNgram(df: DataFrame, idCol: String, textCol: String,
                blockCol: String, w: Int, minJ: Double): DataFrame = {
    val sh = df.select(col(idCol),
      explode(Dedup.wordShingleArray(col(textCol), w)).as("shingle"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val blocks = df.select(col(idCol), col(blockCol))
    val withBlock = sh.join(blocks, idCol)
    val a = withBlock.select(col(blockCol), col("shingle"), col(idCol).as("id_a"))
    val b = withBlock.select(col(blockCol), col("shingle"), col(idCol).as("id_b"))
    val inter = a.join(b, Seq(blockCol, "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    def docs = graft.Tables.load(spark, dir, "documents").withColumn("blk",
      concat_ws("_", col("lang"), expr("length(text) DIV 64")))

    // parity: kernel shingles == declarative shingles, doc by doc
    val mismatch = docs.select(
        call_function(graft.plans.GraftFunctions.WordShinglesName,
          col("text"), lit(graft.QueriesML.JaccardW)).as("k"),
        Dedup.wordShingleArray(col("text"), graft.QueriesML.JaccardW).as("d"))
      .filter(not(col("k") === col("d"))).count()
    println(s"[ab] shingle kernel/declarative mismatches: $mismatch")

    def curQ() = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "blk",
      graft.QueriesML.JaccardW, graft.QueriesML.JaccardThreshold, wordGrams = true)
    def declQ() = declNgram(docs, "doc_id", "text", "blk",
      graft.QueriesML.JaccardW, graft.QueriesML.JaccardThreshold)
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    time(curQ); time(declQ)
    val rounds = 3
    val curs = (1 to rounds).map(_ => time(curQ))
    val decls = (1 to rounds).map(_ => time(declQ))
    println(f"[ab] cur(kernel selfjoin): min=${curs.min}%.3f all=${curs.map(x => f"$x%.2f").mkString(",")}")
    println(f"[ab] decl(hof selfjoin):   min=${decls.min}%.3f all=${decls.map(x => f"$x%.2f").mkString(",")}")
    println("[ab] rows cur=" + curQ().count() + " decl=" + declQ().count())
    spark.stop()
  }
}
