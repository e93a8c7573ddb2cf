package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: ids/scores kept sorted score-desc, id-asc.
  * Insertion is shift-based (k is small); no allocation after
  * construction. */
final class TopKBuf(val k: Int) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(id: Long, score: Double): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var i = 0
    while (i < n && !better(score, id, scores(i), ids(i))) i += 1
    if (i >= k) return
    var j = math.min(n, k - 1)
    while (j > i) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    ids(i) = id
    scores(i) = score
    if (n < k) n += 1
  }
}

/** `graft_topk(id, score, k)`: per-group top-k (score desc, id asc) as
  * a native TypedImperativeAggregate — the partial-aggregable top-k cut
  * for ANN search. Each map task reduces its partition to at most k
  * candidates per group BEFORE the shuffle (volume O(groups x k x
  * partitions), independent of corpus size), unlike the window-function
  * formulation which shuffles every scored row.
  *
  * Replaces the Dataset-`Aggregator` variant (round 2): that path paid
  * object-serde per row (ScoredId case-class encoder in/out of the
  * ObjectHashAggregate buffer plus an immutable-Vector insert per
  * element); this one updates two primitive arrays in place and
  * serializes only at shuffle boundaries.
  */
case class TopKAgg(idExpr: Expression, scoreExpr: Expression, k: Int,
                   override val mutableAggBufferOffset: Int = 0,
                   override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (idExpr.dataType, scoreExpr.dataType) match {
      case (LongType, DoubleType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double) and k > 0")
    }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      buf.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    }
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.ids(i), b.scores(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData((0 until buf.n).map(i =>
      InternalRow(buf.ids(i), buf.scores(i))).toArray[Any])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); buf.scores(i) = bb.getDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}
