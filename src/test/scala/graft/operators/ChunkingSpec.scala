package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: window/stride boundaries, short docs, short tail") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words, w=4 s=3
      (2L, "a b")                                     // shorter than window
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(df, "doc_id", "text", window = 4, stride = 3)
      .as[(Long, Int, String, Int)].collect().toSet
    assert(out == Set(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w4 w5 w6 w7", 4),
      (1L, 2, "w7 w8 w9 w10", 4),
      (2L, 0, "a b", 2)))
  }

  test("chunking: every doc covered, overlap = window - stride") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val chunks = Chunking.chunk(docs, "doc_id", "text", 32, 24)
    // every doc yields >= 1 chunk
    assert(chunks.select("doc_id").distinct().count() == docs.count())
    // reconstruction: chunk 0 plus each later chunk's last `stride`
    // words (its non-overlapping suffix) re-creates the document
    val ok = chunks.select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .as("cs"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("rebuilt", concat_ws(" ",
        transform(col("cs"), (c, i) => when(i === 0, c.getField("chunk_text"))
          .otherwise(concat_ws(" ",
            slice(split(c.getField("chunk_text"), " "), 32 - 24 + 1, 24))))))
      .filter(col("rebuilt") =!= col("text"))
    assert(ok.count() == 0)
  }

  test("packing: bins advance with the running token sum, offsets exact") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 300L), (4L, "h", 50L)
    ).toDF("doc_id", "lang", "n_tokens")
    val out = Chunking.packSequences(df, "doc_id", "n_tokens", "lang", 512)
      .select("doc_id", "bin", "start_offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 600L),
      (4L, 0L, 0L)))
  }

  test("profile: one row per column with exact stats") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.5), (2.0, null), (2.0, 20.25))
      .toDF("a", "b")
    val out = Profile.numeric(df, Seq(
        "a" -> round(col("a")).cast("long"),
        "b" -> round(col("b") * 100).cast("long")))
      .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      ("a", 0L, 2L, Some(1L), Some(2L)),
      ("b", 1L, 2L, Some(1050L), Some(2025L))))
  }
}
