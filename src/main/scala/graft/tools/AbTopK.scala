package graft.tools

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Interleaved A/B: the retired Dataset-Aggregator top-k (reconstructed
  * here verbatim) vs the native TypedImperativeAggregate path now in
  * [[Similarity.bruteTopKAgg]]. One JVM, alternating runs.
  * Usage: runMain graft.tools.AbTopK <sfDir>
  */
object AbTopK {

  case class ScoredId(id: Long, score: Double)

  class OldTopK(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    override def zero: Seq[ScoredId] = Vector.empty
    override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = insert(buf, x)
    private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
      if (buf.size == k && better(buf.last, x)) buf
      else {
        val i = buf.indexWhere(b => better(x, b)) match {
          case -1 => buf.size
          case n => n
        }
        (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
      }
    }
    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  def oldBruteTopKAgg(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    def prep(df: DataFrame, idAs: String, vAs: String, nAs: String) =
      df.select(col("vec_id").as(idAs),
          Similarity.fixedPoint(col("embedding")).as(vAs))
        .withColumn(nAs,
          call_function(graft.plans.GraftFunctions.DotLongName, col(vAs), col(vAs)))
    val q = prep(queries, "query_id", "qv", "qn2")
    val c = prep(corpus, "cand_id", "cv", "cn2")
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id").as("id"),
        (call_function(graft.plans.GraftFunctions.DotLongName, col("qv"), col("cv"))
          .cast("double") /
          sqrt(col("qn2").cast("double") * col("cn2").cast("double"))).as("score"))
      .as[(Long, Long, Double)]
      .map { case (qid, id, score) => (qid, ScoredId(id, score)) }
    val topk = new OldTopK(k).toColumn
    scored.groupByKey(_._1).mapValues(_._2).agg(topk)
      .flatMap { case (qid, items) =>
        items.iterator.zipWithIndex.map { case (s, i) => (qid, s.id, i + 1, s.score) }
      }
      .toDF("query_id", "cand_id", "rank", "cos")
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[abtopk] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    // warm-up both
    oldBruteTopKAgg(emb, q, 3).count()
    Similarity.bruteTopKAgg(emb, q, "vec_id", "embedding", 3).count()
    // row-identity check
    val a = oldBruteTopKAgg(emb, q, 3).collect().map(_.toSeq).toSet
    val b = Similarity.bruteTopKAgg(emb, q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet
    println(s"[abtopk] row-identical: ${a == b} (${a.size} rows)")
    for (r <- 1 to 3) {
      time(s"r$r old-aggregator")(oldBruteTopKAgg(emb, q, 3).count())
      time(s"r$r native-topk")(
        Similarity.bruteTopKAgg(emb, q, "vec_id", "embedding", 3).count())
    }
    spark.stop()
  }
}
