package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the full custom-operator tier
  * (LogicalPlan + SparkStrategy + SparkPlan), for the one join shape
  * Spark's public surface genuinely lacks. Semantics: for every left
  * row, attach the `rightValues` of the LATEST right row with the same
  * key and `rightOrder <= leftOrder` (backward, inclusive) — identical
  * to [[graft.operators.AsOf.asofJoin]]'s union+window composition and
  * to DuckDB's ASOF LEFT JOIN.
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, order) — Spark's EnsureRequirements inserts the exchanges and
  * sorts exactly as it would for a sort-merge join — then a single
  * streaming merge per partition holding ONE buffered right row.
  * Memory per task is O(1); a right-heavy key never buffers (compare:
  * the union+window form materializes the window frame machinery, and
  * a range-join formulation would buffer every right row per key).
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftOrder: Expression,
                        rightKey: Expression, rightOrder: Expression,
                        rightValues: Seq[NamedExpression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(leftKey: Expression, leftOrder: Expression,
                        rightKey: Expression, rightOrder: Expression,
                        rightValues: Seq[NamedExpression],
                        valueAttrs: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftOrder, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightOrder, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey
    val lOrd = leftOrder
    val rKey = rightKey
    val rOrd = rightOrder
    val rVals = rightValues
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val nValues = valueAttrs.length
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lOrd), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rOrd), rOut)
      val vProj = UnsafeProjection.create(rVals, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ valueAttrs)
      val nullValues = new GenericInternalRow(nValues)
      val joined = new JoinedRow
      val rBuf = rit.buffered
      // last right row consumed: valid for the CURRENT left key only
      var haveMatch = false
      var mKey = 0L
      var mValues: InternalRow = null
      lit.map { lrow =>
        val lp = lProj(lrow)
        if (lp.isNullAt(0) || lp.isNullAt(1)) {
          outProj(joined(lrow, nullValues))
        } else {
          val lk = lp.getLong(0)
          val lo = lp.getLong(1)
          var continue = true
          while (continue && rBuf.hasNext) {
            val rp = rProj(rBuf.head)
            if (rp.isNullAt(0) || rp.isNullAt(1)) {
              rBuf.next() // null key/order never matches anything
            } else {
              val rk = rp.getLong(0)
              val ro = rp.getLong(1)
              if (rk < lk || (rk == lk && ro <= lo)) {
                mKey = rk
                mValues = vProj(rBuf.head).copy() // rows are reused buffers
                haveMatch = true
                rBuf.next()
              } else {
                continue = false
              }
            }
          }
          if (haveMatch && mKey == lk) outProj(joined(lrow, mValues))
          else outProj(joined(lrow, nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsofJoinPlan -> AsofJoinExec. Registered by
  * [[GraftExtensions]] (session build time) or appended to
  * `spark.experimental.extraStrategies` (runtime, public API). */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      // the exec reads keys/orders with getLong: anything else would
      // produce silently wrong rows (UnsafeRow.getLong on an int slot
      // zero-extends), so fail planning loudly instead
      val longT = org.apache.spark.sql.types.LongType
      require(Seq(p.leftKey, p.leftOrder, p.rightKey, p.rightOrder)
        .forall(_.dataType == longT),
        "AsofJoinPlan requires LongType key and order expressions, got " +
          Seq(p.leftKey, p.leftOrder, p.rightKey, p.rightOrder)
            .map(_.dataType.simpleString).mkString(", "))
      AsofJoinExec(p.leftKey, p.leftOrder, p.rightKey, p.rightOrder,
        p.rightValues, p.output.drop(p.left.output.length),
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
