package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator over (id, score) pairs: keeps the k highest
  * scores (ties broken by smaller id) with a bounded buffer.
  *
  * This is the scale-correct top-k: it is PARTIAL-aggregable, so each
  * map task reduces its partition to at most k candidates per group
  * before the shuffle — shuffle volume is O(groups x k x partitions),
  * independent of corpus size. The window-function alternative
  * (row_number over all scored rows) shuffles EVERY scored row to the
  * group's reducer and skews when one group dominates.
  *
  * Buffer is a plain sorted array (k is small); merge is a linear
  * merge-and-truncate.
  */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
  extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  /** score desc, id asc — deterministic total order. */
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    insert(buf, x)

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
