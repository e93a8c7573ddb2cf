package graft.sources

import org.apache.spark.sql.{GraftSqlShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL DDL for MATERIALIZED views over [[GraftCatalog]] tables —
  * the statement surface of the incremental-view-maintenance layer
  * ([[MaterializedView]] / [[JoinMaterializedView]]):
  *
  * {{{
  * CREATE MATERIALIZED VIEW gt.rev AS
  *   SELECT c_mktsegment, count(*) AS cnt,
  *          sum(price_cents) AS sum_price_cents
  *   FROM gt.orders JOIN gt.customer USING (custkey)
  *   GROUP BY c_mktsegment
  * REFRESH MATERIALIZED VIEW gt.rev      -- or CALL gt.system.refresh_mv('rev')
  * DROP MATERIALIZED VIEW [IF EXISTS] gt.rev
  * }}}
  *
  * Spark's grammar has no MATERIALIZED VIEW statement, so a delegating
  * [[GraftSqlParser]] (injected via `spark.sql.extensions`) claims
  * exactly these three statement forms and hands every other statement
  * to Spark's own parser untouched. The defining query is parsed by
  * the DELEGATE parser and must be one of the two incrementally
  * maintainable shapes — group/sum over a table, or group/sum over an
  * inner USING equi-join of two tables (count is subtractable, sums
  * fold signed deltas; arbitrary queries are refused loudly at CREATE
  * time, never accepted-then-stale). The aggregate aliases must be the
  * canonical stored names (`cnt`, `sum_<col>`), so what the user
  * declared is exactly what reads return.
  *
  * The view itself is a plain versioned table in the warehouse —
  * `SELECT * FROM gt.rev` needs no extra machinery, time travel and
  * the whole maintenance surface work on it — whose commit metadata
  * carries the source table paths; REFRESH dispatches on that
  * metadata to the right signed-delta fold (I/O O(changed files),
  * never a source rescan — the point of the layer at 100 TB).
  */
object GraftMv {

  private[sources] val SourceKey = "mv_source"
  private[sources] val FactKey = "mv_fact"
  private[sources] val DimKey = "mv_dim"

  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?(.+?)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([^;\s]+)\s*;?\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([^;\s]+)\s*;?\s*$""".r

  /** Claims the three MV statements; None for everything else. */
  def parse(sqlText: String, delegate: ParserInterface,
            spark: SparkSession): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNotExists, name, query) =>
      val (cat, ident) = resolve(spark,
        delegate.parseMultipartIdentifier(name))
      Some(classify(delegate.parsePlan(query), spark) match {
        case MvSingle(src, groups, sums) =>
          CreateMvCommand(cat, ident, Left(src), None, groups, sums,
            ifNotExists != null)
        case MvJoin(fact, dim, key, groups, sums) =>
          CreateMvCommand(cat, ident, Right((fact, dim)), Some(key),
            groups, sums, ifNotExists != null)
      })
    case DropRe(ifExists, name) =>
      val (cat, ident) = resolve(spark,
        delegate.parseMultipartIdentifier(name))
      Some(DropMvCommand(cat, ident, ifExists != null))
    case RefreshRe(name) =>
      val (cat, ident) = resolve(spark,
        delegate.parseMultipartIdentifier(name))
      Some(RefreshMvCommand(cat, ident))
    case _ => None
  }

  /** Name → (owning graft catalog, identifier): explicit
    * `cat.ns....name` when `cat` is a graft catalog, else the current
    * catalog when it is ours — never a name another registered
    * catalog qualifies. */
  private def resolve(spark: SparkSession, parts: Seq[String])
      : (GraftCatalog, Identifier) = {
    def graft(n: String): Option[GraftCatalog] =
      GraftSqlShims.lookupCatalog(spark, n)
        .collect { case g: GraftCatalog => g }
    (graft(parts.head) match {
      case Some(g) if parts.length >= 2 =>
        Some((g, Identifier.of(parts.tail.dropRight(1).toArray,
          parts.last)))
      case _ if parts.length == 1 ||
          GraftSqlShims.lookupCatalog(spark, parts.head).isEmpty =>
        graft(GraftSqlShims.currentCatalogName(spark)).map { g =>
          val ns = GraftSqlShims.currentNamespace(spark).toSeq ++
            parts.dropRight(1)
          (g, Identifier.of(ns.toArray, parts.last))
        }
      case _ => None
    }).getOrElse(sys.error("MATERIALIZED VIEW statements need a graft " +
      s"catalog name (got ${parts.mkString(".")}); register one with " +
      "spark.sql.catalog.<name> = graft.sources.GraftCatalog"))
  }

  private sealed trait MvShape
  private case class MvSingle(source: String, groups: Seq[String],
                              sums: Seq[String]) extends MvShape
  private case class MvJoin(fact: String, dim: String, key: String,
                            groups: Seq[String], sums: Seq[String])
      extends MvShape

  private def refuse(why: String): Nothing = sys.error(
    s"not incrementally maintainable: $why. A materialized view is " +
      "GROUP BY <cols> with count(*) AS cnt and sum(<c>) AS sum_<c> " +
      "over a table or an inner `JOIN ... USING (key)` of two tables")

  /** The defining query must be one of the two maintainable shapes. */
  private def classify(plan: LogicalPlan,
                       spark: SparkSession): MvShape = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    def tablePathOf(parts: Seq[String]): String = {
      val (cat, ident) = resolve(spark, parts)
      val path = cat.tablePath(ident)
      require(isTableDir(spark, path),
        s"${parts.mkString(".")} is not a committed graft table")
      path
    }
    strip(plan) match {
      case Aggregate(gs, aggs, child, _) =>
        val groups = gs.map {
          case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
            ua.nameParts.head
          case other => refuse(s"GROUP BY must name plain columns, " +
            s"got ${other.sql}")
        }
        val sums = aggs.flatMap {
          case ua: UnresolvedAttribute
              if ua.nameParts.length == 1 &&
                groups.contains(ua.nameParts.head) => None
          case al @ Alias(fn: UnresolvedFunction, name)
              if fn.nameParts.map(_.toLowerCase) == Seq("count") &&
                !fn.isDistinct && fn.filter.isEmpty &&
                fn.arguments.forall(_.isInstanceOf[Literal]) =>
            require(name == "cnt",
              s"alias count(*) AS cnt (got AS $name) — the stored " +
                "column name is canonical")
            None
          case al @ Alias(fn: UnresolvedFunction, name)
              if fn.nameParts.map(_.toLowerCase) == Seq("sum") &&
                !fn.isDistinct && fn.filter.isEmpty &&
                fn.arguments.length == 1 &&
                fn.arguments.head.isInstanceOf[UnresolvedAttribute] =>
            val c = fn.arguments.head.asInstanceOf[UnresolvedAttribute]
              .nameParts.last
            require(name == s"sum_$c",
              s"alias sum($c) AS sum_$c (got AS $name) — the stored " +
                "column name is canonical")
            Some(c)
          case other =>
            refuse(s"unsupported select item ${other.sql} (only group " +
              "columns, count(*) AS cnt, sum(c) AS sum_c)")
        }
        require(aggs.exists {
          case Alias(fn: UnresolvedFunction, _) =>
            fn.nameParts.map(_.toLowerCase) == Seq("count")
          case _ => false
        }, "the select list must include count(*) AS cnt (counts make " +
          "deletes foldable and empty groups droppable)")
        strip(child) match {
          case ur: UnresolvedRelation =>
            MvSingle(tablePathOf(ur.multipartIdentifier), groups, sums)
          case Join(l, r, joinType, None, _) =>
            val key = joinType match {
              case org.apache.spark.sql.catalyst.plans.UsingJoin(
                  Inner, Seq(k)) => k
              case other => refuse(
                s"only inner JOIN ... USING (one_key), got $other")
            }
            (strip(l), strip(r)) match {
              case (lf: UnresolvedRelation, rd: UnresolvedRelation) =>
                MvJoin(tablePathOf(lf.multipartIdentifier),
                  tablePathOf(rd.multipartIdentifier), key, groups, sums)
              case _ => refuse("join sides must be plain tables")
            }
          case other =>
            refuse(s"FROM must be a table or a two-table join, got " +
              other.nodeName)
        }
      case other =>
        refuse(s"top level must be an aggregate, got ${other.nodeName}")
    }
  }

  private[sources] def isTableDir(spark: SparkSession,
                                  path: String): Boolean =
    try VersionedTable.versions(spark, path).nonEmpty
    catch { case _: java.io.FileNotFoundException => false }

  private[sources] def mvMeta(spark: SparkSession,
                              mvPath: String): Map[String, String] = {
    val v = VersionedTable.versions(spark, mvPath).last
    VersionedTable.metaOf(VersionedTable.manifest(spark, mvPath, v))
  }

  private[sources] def isMv(spark: SparkSession, mvPath: String): Boolean =
    isTableDir(spark, mvPath) && {
      val m = mvMeta(spark, mvPath)
      m.contains(SourceKey) || m.contains(FactKey)
    }

  /** Refresh dispatch on the view's stored source metadata — shared
    * by the REFRESH statement and `CALL gt.system.refresh_mv`. */
  private[sources] def refreshMv(spark: SparkSession,
                                 mvPath: String): Int = {
    require(isTableDir(spark, mvPath), s"no materialized view at $mvPath")
    val meta = mvMeta(spark, mvPath)
    if (meta.contains(FactKey))
      JoinMaterializedView.refresh(spark, meta(FactKey), meta(DimKey),
        mvPath)
    else if (meta.contains(SourceKey))
      MaterializedView.refresh(spark, meta(SourceKey), mvPath)
    else sys.error(s"$mvPath is a table, not a materialized view")
  }
}

/** The delegating parser [[graft.plans.GraftExtensions]] injects:
  * claims the three MATERIALIZED VIEW statements, hands everything
  * else to Spark's parser verbatim. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    (if (sqlText.toUpperCase(java.util.Locale.ROOT)
        .contains("MATERIALIZED"))
      GraftMv.parse(sqlText, delegate, SparkSession.active)
    else None).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

case class CreateMvCommand(catalog: GraftCatalog, ident: Identifier,
                           sources: Either[String, (String, String)],
                           joinKey: Option[String],
                           groupCols: Seq[String], sumCols: Seq[String],
                           ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val mvPath = catalog.tablePath(ident)
    if (GraftMv.isTableDir(session, mvPath)) {
      if (ifNotExists && GraftMv.isMv(session, mvPath)) return Seq.empty
      sys.error(s"$ident already exists")
    }
    sources match {
      case Left(src) =>
        MaterializedView.build(session, src, mvPath, groupCols, sumCols,
          extraMeta = Map(GraftMv.SourceKey -> src))
      case Right((fact, dim)) =>
        JoinMaterializedView.build(session, fact, dim, mvPath,
          joinKey.get, groupCols, sumCols,
          extraMeta = Map(GraftMv.FactKey -> fact,
            GraftMv.DimKey -> dim))
    }
    Seq.empty
  }
}

case class DropMvCommand(catalog: GraftCatalog, ident: Identifier,
                         ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val mvPath = catalog.tablePath(ident)
    if (!GraftMv.isTableDir(session, mvPath)) {
      if (ifExists) return Seq.empty
      sys.error(s"no such materialized view: $ident")
    }
    require(GraftMv.isMv(session, mvPath),
      s"$ident is a table, not a materialized view — use DROP TABLE")
    val p = new org.apache.hadoop.fs.Path(mvPath)
    p.getFileSystem(session.sparkContext.hadoopConfiguration)
      .delete(p, true)
    Seq.empty
  }
}

case class RefreshMvCommand(catalog: GraftCatalog, ident: Identifier)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = GraftMv.refreshMv(session, catalog.tablePath(ident))
    Seq(Row(v.toLong))
  }
}
