package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation for LLM training pipelines: overlapping
  * document chunking and sequential token-budget packing.
  *
  * Both are engine-portable by construction: chunk boundaries and bin
  * assignment are exact integer arithmetic over word counts, so the
  * DuckDB oracle reproduces them bit-for-bit.
  */
object Chunking {

  /** Split each document into word chunks of `window` words advancing
    * by `stride` (overlap = window - stride), the sliding-context shape
    * of LM pretraining prep. The last chunk may be short; a document
    * shorter than `window` yields exactly one chunk.
    *
    * Narrow: chunk construction is per-row array arithmetic (transform
    * + slice) followed by one explode — no shuffle; at 100 TB this is
    * a pure map stage that multiplies rows by ~n/stride. */
  /** `carryCols`: pass-through columns (e.g. a partitioning key like
    * lang) that ride the narrow explode for free — recovering them
    * downstream via a join against the corpus would shuffle the whole
    * chunk fan-out. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            window: Int, stride: Int,
            carryCols: Seq[String] = Nil): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window (got window=$window stride=$stride)")
    val toks = split(col(textCol), " ")
    val carry = carryCols.map(col)
    df.select(col(idCol) +: carry :+ toks.as("__t"): _*)
      .withColumn("__n", size(col("__t")))
      // ADDITIONAL chunks past the first: ceil((n - window) / stride);
      // operands are positive, so double-divide + int cast == DIV
      .withColumn("__k", when(col("__n") <= window, lit(0)).otherwise(
        ((col("__n") - window + (stride - 1)) / stride).cast("int")))
      .select(col(idCol) +: carry :+ col("__n") :+
        explode(transform(sequence(lit(0), col("__k").cast("int")),
          i => struct(i.as("idx"),
            concat_ws(" ", slice(col("__t"), i * stride + 1, lit(window)))
              .as("chunk")))).as("c"): _*)
      .select(col(idCol) +: carry :+ col("c.idx").as("chunk_idx") :+
        col("c.chunk").as("chunk_text") :+
        least(lit(window), col("__n") - col("c.idx") * stride)
          .as("n_chunk_words"): _*)
  }

  /** Sequential token-budget packing: within each `groupCol` stratum,
    * documents are laid end-to-end in `orderCol` order and assigned to
    * the training-sequence bin their FIRST token falls in —
    * bin = exclusive-prefix-sum(tokens) DIV budget. This is the
    * deterministic streaming form of sample packing (greedy first-fit
    * would need per-bin state and is order-fragile); a doc may straddle
    * a bin boundary, which downstream tokenization handles by splitting
    * at the boundary.
    *
    * One window shuffle on the stratum key; the running sum is a
    * partial-aggregable prefix scan per partition. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    groupCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .select(col(idCol), col(groupCol), col(tokenCol),
        expr(s"__start DIV $budget").as("bin"),
        col("__start").as("start_offset"))
  }
}
