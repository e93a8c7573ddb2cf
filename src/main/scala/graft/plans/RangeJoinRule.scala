package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite a non-equi "point BETWEEN lo AND hi" inner
  * join into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin]] — automatically, for plans written as
  * plain SQL/DataFrame theta joins.
  *
  * Without an equi-key Spark plans BroadcastNestedLoopJoin (or a
  * cartesian shuffle): O(n*m). This rule quantizes the shared domain
  * into `spark.graft.rangeJoin.bucketWidth`-sized cells, replicates
  * each interval into the cells it overlaps (explode of a sequence),
  * and equi-joins on the cell. Every qualifying pair meets in exactly
  * one cell (the point's), and the ORIGINAL predicate is re-applied
  * above the join, so the rewrite is semantics-preserving for any
  * bucket width: no duplicates, no lost or extra rows.
  *
  * Fires only when: inner join, a condition with a recognizable
  * (p >= / > lo) AND (p <= / < hi) pair over integral columns split
  * across the two sides, and NO existing equi-join conjunct (an
  * equi-key means Spark already has a hash/merge strategy). Disabled
  * unless the width conf is set to a positive value — width choice is
  * domain knowledge (pick ~ the typical interval length).
  *
  * Deploy: `spark.sql.extensions=graft.plans.GraftExtensions` or
  * runtime `GraftFunctions.installRangeJoinRule(spark)`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // tolerant parse: a malformed conf value must degrade to a no-op,
    // not throw inside the optimizer for every query in the session
    val width = conf.getConfString(WidthConf, "0").toLongOption.getOrElse(0L)
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType ||
      e.dataType == DateType || // day-precision integers under the hood
      e.dataType == TimestampType // micros; bucketed at second precision

  /** Numeric view of a bucketing operand: dates -> epoch days
    * (UnixDate), timestamps -> epoch SECONDS (Cast). Bucketing only
    * needs a MONOTONIC map — the residual predicate still compares the
    * original values — and the analyzer has already unified operand
    * types across the predicate, so equal logical values land in equal
    * cells. Width is therefore in days for dates and seconds for
    * timestamps. */
  private def numeric(e: Expression): Expression = e.dataType match {
    case DateType => UnixDate(e)
    case TimestampType => Cast(e, LongType)
    case _ => e
  }

  /** (point, bound) with point/bound each fully evaluable on opposite
    * sides of the join — normalized so the returned pair is
    * (pointExpr, boundExpr, pointOnLeft). */
  private def sidedPair(a: Expression, b: Expression,
                        j: Join): Option[(Expression, Expression, Boolean)] =
    if (canEvaluate(a, j.left) && canEvaluate(b, j.right)) Some((a, b, true))
    else if (canEvaluate(a, j.right) && canEvaluate(b, j.left)) Some((a, b, false))
    else None

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // only a column-to-column equality is an equi-JOIN key; a
    // column-vs-literal EqualTo is just a filter (canEvaluate is true
    // for literals on either side) and must not suppress the rewrite
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
        sidedPair(a, b, j).isDefined
      case _ => false
    }
    if (hasEqui) return None

    // lower bounds on p: p >= lo / p > lo (and flipped spellings)
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(p, lo) => sidedPair(p, lo, j)
      case GreaterThan(p, lo) => sidedPair(p, lo, j)
      case LessThanOrEqual(lo, p) => sidedPair(p, lo, j).map(t => t)
      case LessThan(lo, p) => sidedPair(p, lo, j)
      case _ => None
    }
    // upper bounds on p: p <= hi / p < hi (and flipped spellings)
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(p, hi) => sidedPair(p, hi, j)
      case LessThan(p, hi) => sidedPair(p, hi, j)
      case GreaterThanOrEqual(hi, p) => sidedPair(p, hi, j)
      case GreaterThan(hi, p) => sidedPair(p, hi, j)
      case _ => None
    }

    // match a lower and an upper over the SAME point expression, with
    // the two bounds on the side opposite the point
    val triple = (for {
      (p1, lo, pLeft1) <- lowers.iterator
      (p2, hi, pLeft2) <- uppers.iterator
      if p1.semanticEquals(p2) && pLeft1 == pLeft2
      if integral(p1) && integral(lo) && integral(hi)
    } yield (p1, lo, hi, pLeft1)).nextOption()

    triple.map { case (p, lo, hi, pointOnLeft) =>
      val (pointSide, intervalSide) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      def cellOf(e: Expression): Expression =
        Cast(Floor(Divide(Cast(numeric(e), DoubleType),
          Literal(width.toDouble))), LongType)

      val pCell = Alias(cellOf(p), "__graft_cell_p")()
      val pointB = Project(pointSide.output :+ pCell, pointSide)

      // Sequence is TimeZoneAwareExpression: without a zone id the
      // expression is unresolved and plan validation rejects the rewrite
      val generator = Explode(Sequence(cellOf(lo), cellOf(hi), None,
        Some(conf.sessionLocalTimeZone)))
      val elem = generator.elementSchema.head
      val cellAttr = AttributeReference("__graft_cell_i", elem.dataType,
        elem.nullable)()
      val gen = Generate(generator,
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(cellAttr), child = intervalSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (pointB, gen) else (gen, pointB)
      val cellJoin = Join(newLeft, newRight, Inner,
        Some(EqualTo(pCell.toAttribute, cellAttr)), j.hint)
      // original predicate re-applied verbatim -> semantics preserved
      Project(j.output, Filter(j.condition.get, cellJoin))
    }
  }
}

object RangeJoinRuleInstaller {
  /** Runtime installation for sessions not built with GraftExtensions
    * (idempotent). The rule still no-ops until the width conf is set. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule
    }
  }
}
