package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary: at most `k - 1` counters.
  *
  * Deterministic GUARANTEES (independent of stream/merge order, which
  * the counter VALUES are not):
  *   - `count(x) <= freq(x)` — counts never overestimate;
  *   - `count(x) >= freq(x) - n/k` — so every x with
  *     `freq(x) > n/k` is PRESENT in the summary (n = items observed).
  * Those two booleans — not the raw counts — are what the oracle gate
  * checks (q_heavy_hitters), the same invariant-projection pattern as
  * the HLL sketch-bound gates.
  */
final class MgBuf(val k: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  def add(key: UTF8String): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1)
      case None if counts.size < k - 1 =>
        // clone: the UTF8String points into a reused row buffer
        counts.update(key.clone(), 1L)
      case None =>
        // decrement-all: one "arrival group" of k distinct items cancels
        val dead = mutable.ArrayBuffer[UTF8String]()
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (w, c) => if (c <= 0) dead += w }
        dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS '12): sum
    * counts pairwise, then if over capacity subtract the k-th largest
    * count from every counter and drop the non-positive. Total error
    * stays <= (n1 + n2)/k. */
  def mergeIn(other: MgBuf): Unit = {
    other.counts.foreach { case (w, c) =>
      counts.update(w, counts.getOrElse(w, 0L) + c)
    }
    if (counts.size > k - 1) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer[UTF8String]()
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.foreach { case (w, c) => if (c <= 0) dead += w }
      dead.foreach(counts.remove)
    }
  }
}

/** `graft_heavy_hitters(col, k)`: Misra-Gries summary as a native
  * TypedImperativeAggregate returning `map<string, bigint>`. Partial
  * state is at most `k - 1` (word, count) entries per map task, so the
  * shuffle volume is O(k x partitions) regardless of input rows — the
  * frequency analog of [[TopKAgg]]'s top-k cut, and the shape that
  * lets one pass over 100 TB return its heavy hitters through a
  * kilobyte-sized merge tree.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column and k > 1")
  }

  override def createAggregationBuffer(): MgBuf = new MgBuf(k)

  override def update(buf: MgBuf, input: InternalRow): MgBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = { a.mergeIn(b); a }

  override def eval(buf: MgBuf): Any = {
    val entries = buf.counts.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: MgBuf): Array[Byte] = {
    val entries = buf.counts.toArray
    val size = 8 + entries.map(e => 12 + e._1.numBytes()).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.k).putInt(entries.length)
    entries.foreach { case (w, c) =>
      val bytes = w.getBytes
      bb.putInt(bytes.length).put(bytes).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuf(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val wb = new Array[Byte](len)
      bb.get(wb)
      buf.counts.update(UTF8String.fromBytes(wb), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}
