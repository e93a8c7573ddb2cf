package graft.sources

import org.apache.spark.sql.{GraftSqlShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.{CurrentNamespace, RelationTimeTravel, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Analyzer support for [[GraftCatalog]]'s SQL views. Spark 4.1 ships
  * the DSv2 `ViewCatalog` INTERFACE but no resolution for it — no
  * built-in rule ever calls `loadView`, and `ResolveSessionCatalog`
  * refuses every view statement aimed at a non-session catalog
  * (MISSING_CATALOG_ABILITY) before any custom RESOLUTION rule could
  * run. This rule therefore runs in the HINT-RESOLUTION batch — ahead
  * of the Resolution batch — on the still-unresolved nodes (injected
  * by [[graft.plans.GraftExtensions]], the same deploy seam as the
  * range join and as-of strategies):
  *
  *  - `CREATE [OR REPLACE] VIEW gt.v [(cols)] AS <q>` /
  *    `ALTER VIEW gt.v AS <q>` — replaced with a command that, at
  *    execution, analyzes the defining query (capturing its schema
  *    into the stored definition, exactly V1 CreateViewCommand's
  *    protocol) and publishes through the catalog's
  *    createView/replaceView.
  *  - `SELECT ... FROM gt.v` — the stored SQL is parsed and spliced
  *    in place of the relation, with relative table names inside the
  *    body qualified by the view's CREATION context (current catalog
  *    + namespace at create time, the standard view-resolution
  *    scoping), declared column aliases applied, and the whole body
  *    wrapped in a SubqueryAlias carrying the view's name. Qualified
  *    (≥ 2 part) view reads always substitute; a bare single-part
  *    name substitutes only under the current graft catalog and only
  *    when nothing that shadows a catalog view claims it — CTE, then
  *    temp view, then catalog view, the standard precedence order.
  *    Time travel INSIDE the body (a pinned `VERSION AS
  *    OF` table read) works unchanged; time travel ON the view itself
  *    is refused loudly — a view has no version history.
  *  - `DROP VIEW`, `SHOW VIEWS`, `ALTER VIEW SET/UNSET TBLPROPERTIES`.
  *
  * Views may reference views (each expansion is re-entered on a later
  * pass). A reference CYCLE cannot resolve and fails with the
  * analyzer's max-iterations error rather than silently — acceptable
  * for a definition that could never produce rows.
  */
object GraftViewRule extends Rule[LogicalPlan] {

  private def spark: SparkSession = SparkSession.active

  private def graftCatalog(name: String): Option[GraftCatalog] =
    GraftSqlShims.lookupCatalog(spark, name)
      .collect { case g: GraftCatalog => g }

  /** DDL-name resolution: explicit `cat.ns....name`, else the current
    * catalog when it is ours (`USE gt; CREATE VIEW v ...`). A name
    * explicitly qualified by ANOTHER registered catalog is never
    * claimed — `spark_catalog.default.v` must keep Spark's own
    * handling even while a graft catalog is current. */
  private def ownedIdent(parts: Seq[String])
      : Option[(String, GraftCatalog, Identifier)] =
    if (parts.isEmpty) None
    else graftCatalog(parts.head) match {
      case Some(g) if parts.length >= 2 =>
        Some((parts.head, g,
          Identifier.of(parts.tail.dropRight(1).toArray, parts.last)))
      case _ if parts.length == 1 ||
          GraftSqlShims.lookupCatalog(spark, parts.head).isEmpty =>
        val cur = GraftSqlShims.currentCatalogName(spark)
        graftCatalog(cur).map { g =>
          val ns = GraftSqlShims.currentNamespace(spark).toSeq ++
            parts.dropRight(1)
          (cur, g, Identifier.of(ns.toArray, parts.last))
        }
      case _ => None
    }

  /** (catalogName, catalog, ident, data) when `parts` is a QUALIFIED
    * name of a stored graft view — the read-substitution lookup. */
  private def viewOf(parts: Seq[String])
      : Option[(String, GraftCatalog, Identifier, GraftViews.ViewData)] =
    if (parts.length < 2) None
    else graftCatalog(parts.head).flatMap { g =>
      val ident = Identifier.of(
        parts.tail.dropRight(1).toArray, parts.last)
      g.viewData(ident).map((parts.head, g, ident, _))
    }

  /** The view body, parsed and scoped: relative names inside qualify
    * by the view's creation context; explicit catalog-qualified names
    * stay as written; names the body defines as CTEs stay bare. The
    * spliced plan lands AFTER the analyzer's Substitution batch has
    * run (this rule lives in the Hints batch), so CTESubstitution
    * would never revisit a `WITH` inside the body — apply it here so
    * `CREATE VIEW v AS WITH t AS (...) SELECT ... FROM t` reads. */
  private def expand(catName: String, ident: Identifier,
                     vd: GraftViews.ViewData): LogicalPlan = {
    val parsed = GraftSqlShims.parsePlan(spark, vd.sql)
    val bodyCtes: Set[String] = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(
        _._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    val qualified = parsed.transformUp {
      case ur: UnresolvedRelation =>
        val parts = ur.multipartIdentifier
        if (parts.length > 1 &&
          GraftSqlShims.lookupCatalog(spark, parts.head).isDefined) ur
        else if (parts.length == 1 && bodyCtes.contains(
          parts.head.toLowerCase(java.util.Locale.ROOT))) ur
        else {
          val full =
            if (parts.length == 1)
              (vd.currentCatalog +: vd.currentNamespace) :+ parts.head
            else vd.currentCatalog +: parts
          ur.copy(multipartIdentifier = full)
        }
    }
    val substituted =
      if (bodyCtes.isEmpty) qualified
      else org.apache.spark.sql.catalyst.analysis
        .CTESubstitution(qualified)
    val aliased =
      if (vd.columnAliases.nonEmpty)
        UnresolvedSubqueryColumnAliases(vd.columnAliases, substituted)
      else substituted
    SubqueryAlias(
      AliasIdentifier(ident.name(), catName +: ident.namespace().toSeq),
      aliased)
  }

  /** Read-path lookup: qualified names always; a SINGLE-part name
    * only when the current catalog is ours AND nothing that shadows a
    * catalog view claims the name (a CTE in this statement, a temp
    * view in the session) — the standard name-precedence order. */
  private def viewOfRead(parts: Seq[String], cteNames: Set[String])
      : Option[(String, GraftCatalog, Identifier, GraftViews.ViewData)] =
    if (parts.length >= 2) viewOf(parts)
    else if (parts.length == 1 &&
      !cteNames.contains(parts.head.toLowerCase(java.util.Locale.ROOT)) &&
      !GraftSqlShims.isTempView(spark, parts)) {
      val cur = GraftSqlShims.currentCatalogName(spark)
      graftCatalog(cur).flatMap { g =>
        val ident = Identifier.of(
          GraftSqlShims.currentNamespace(spark), parts.head)
        g.viewData(ident).map((cur, g, ident, _))
      }
    } else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    lazy val cteNames: Set[String] = plan.collect {
      case w: UnresolvedWith => w.cteRelations.map(
        _._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    plan.resolveOperatorsUp {
      case RelationTimeTravel(u: UnresolvedRelation, _, _)
          if viewOf(u.multipartIdentifier).isDefined =>
        sys.error(s"${u.multipartIdentifier.mkString(".")} is a VIEW — " +
          "views have no version history; time-travel the underlying " +
          "table inside the view body instead")

      case u: UnresolvedRelation =>
        viewOfRead(u.multipartIdentifier, cteNames) match {
          case Some((catName, _, ident, vd)) => expand(catName, ident, vd)
          case None => u
        }

      case cv: CreateView => cv.child match {
        case ui: UnresolvedIdentifier =>
          ownedIdent(ui.nameParts) match {
            case Some((_, g, ident)) =>
              val text = cv.originalText.getOrElse(sys.error(
                "CREATE VIEW needs the original query text"))
              CreateGraftViewCommand(g, ident,
                sql = text, query = cv.query,
                aliases = cv.userSpecifiedColumns.map(_._1),
                colComments = cv.userSpecifiedColumns.map(_._2),
                properties = cv.properties, comment = cv.comment,
                allowExisting = cv.allowExisting, replace = cv.replace,
                currentCatalog = GraftSqlShims.currentCatalogName(spark),
                currentNamespace =
                  GraftSqlShims.currentNamespace(spark).toSeq)
            case None => cv
          }
        case _ => cv
      }

      case av: AlterViewAs => av.child match {
        case uv: UnresolvedView =>
          ownedIdent(uv.multipartIdentifier) match {
            case Some((_, g, ident)) if g.viewExists(ident) =>
              val vd = g.viewData(ident).get
              CreateGraftViewCommand(g, ident,
                sql = av.originalText, query = av.query,
                aliases = Seq.empty, colComments = Seq.empty,
                properties = vd.properties, comment = vd.comment,
                allowExisting = false, replace = true,
                currentCatalog = GraftSqlShims.currentCatalogName(spark),
                currentNamespace =
                  GraftSqlShims.currentNamespace(spark).toSeq)
            case _ => av
          }
        case _ => av
      }

      case sv: SetViewProperties => sv.child match {
        case uv: UnresolvedView =>
          ownedIdent(uv.multipartIdentifier) match {
            case Some((_, g, ident)) if g.viewExists(ident) =>
              AlterGraftViewCommand(g, ident,
                sv.properties.toSeq.map { case (k, v) =>
                  ViewChange.setProperty(k, v) })
            case _ => sv
          }
        case _ => sv
      }

      case uv0: UnsetViewProperties => uv0.child match {
        case uv: UnresolvedView =>
          ownedIdent(uv.multipartIdentifier) match {
            case Some((_, g, ident)) if g.viewExists(ident) =>
              val vd = g.viewData(ident).get
              val missing =
                uv0.propertyKeys.filterNot(vd.properties.contains)
              if (!uv0.ifExists) require(missing.isEmpty,
                s"view has no propert" +
                  s"${if (missing.size == 1) "y" else "ies"} " +
                  missing.mkString(", "))
              AlterGraftViewCommand(g, ident,
                uv0.propertyKeys.map(ViewChange.removeProperty))
            case _ => uv0
          }
        case _ => uv0
      }

      case rt: RenameTable if rt.isView =>
        val parts = rt.child match {
          case uv: UnresolvedView => Some(uv.multipartIdentifier)
          case utv: org.apache.spark.sql.catalyst.analysis
              .UnresolvedTableOrView => Some(utv.multipartIdentifier)
          case _ => None
        }
        parts.flatMap(p => ownedIdent(p)
          .filter { case (_, g, ident) => g.viewExists(ident) }) match {
          case Some((catName, g, ident)) =>
            // an unqualified target stays in the SOURCE view's
            // catalog + namespace (renames never cross catalogs)
            val newIdent =
              if (rt.newName.length >= 2 && rt.newName.head == catName)
                Identifier.of(rt.newName.tail.dropRight(1).toArray,
                  rt.newName.last)
              else {
                require(rt.newName.length == 1 ||
                  GraftSqlShims.lookupCatalog(spark, rt.newName.head)
                    .isEmpty,
                  "a view renames within its own catalog")
                Identifier.of(
                  ident.namespace() ++ rt.newName.dropRight(1),
                  rt.newName.last)
              }
            RenameGraftViewCommand(g, ident, newIdent)
          case None => rt
        }

      case sct @ ShowCreateTable(child, _, output) =>
        val parts = child match {
          case utv: org.apache.spark.sql.catalyst.analysis
              .UnresolvedTableOrView => Some(utv.multipartIdentifier)
          case _ => None
        }
        parts.flatMap(viewOf) match {
          case Some((catName, _, ident, vd)) =>
            ShowCreateGraftViewCommand(catName, ident, vd, output)
          case None => sct
        }

      case dv @ DropView(ui: UnresolvedIdentifier, ifExists) =>
        // only claim the statement when the name IS one of our views
        // (or could only be one: qualified to ours + not a table):
        // temp views and session-catalog views must keep their
        // built-in handling, and DROP VIEW on a graft TABLE must fail
        // with the wrong-object-type error, not silently no-op
        ownedIdent(ui.nameParts) match {
          case Some((_, g, ident)) if g.viewExists(ident) =>
            DropGraftViewCommand(g, ident, ifExists)
          case Some((catName, g, ident)) if g.tableExists(ident) =>
            throw new org.apache.spark.sql.AnalysisException(
              "WRONG_COMMAND_FOR_OBJECT_TYPE",
              Map(
                "operation" -> "DROP VIEW",
                "requiredType" -> "VIEW",
                "objectName" ->
                  (catName +: ident.namespace().toSeq :+ ident.name())
                    .mkString("."),
                "foundType" -> "TABLE",
                "alternative" -> "DROP TABLE"),
              None)
          case Some((_, g, ident))
              if ui.nameParts.length >= 2 && ifExists =>
            DropGraftViewCommand(g, ident, ifExists)
          case _ => dv
        }

      case sh @ ShowViews(ns, pattern, output) =>
        val parts = ns match {
          case un: UnresolvedNamespace => Some(un.multipartIdentifier)
          case CurrentNamespace => Some(Seq.empty[String])
          case _ => None
        }
        parts.flatMap(p => ownedIdent(p :+ "?").map {
          case (_, g, ident) => (g, ident.namespace().toSeq) }) match {
          case Some((g, namespace)) =>
            ShowGraftViewsCommand(g, namespace, pattern, output)
          case None => sh
        }
    }
  }
}

/** CREATE / CREATE OR REPLACE / ALTER ... AS — analyzes the defining
  * query at execution (capturing its schema, V1 CreateViewCommand's
  * protocol), then one publish through the catalog ([[GraftViews]]'
  * no-replace discipline underneath). The unresolved `query` rides as
  * a FIELD, not a child, so the analyzer leaves it to us. */
case class CreateGraftViewCommand(catalog: GraftCatalog,
                                  ident: Identifier,
                                  sql: String,
                                  query: LogicalPlan,
                                  aliases: Seq[String],
                                  colComments: Seq[Option[String]],
                                  properties: Map[String, String],
                                  comment: Option[String],
                                  allowExisting: Boolean,
                                  replace: Boolean,
                                  currentCatalog: String,
                                  currentNamespace: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val analyzed = GraftSqlShims.ofRows(session, query)
    val out = analyzed.queryExecution.analyzed.output
    require(aliases.isEmpty || aliases.length == out.length,
      s"view column list has ${aliases.length} names for " +
        s"${out.length} query columns")
    val viewSchema: StructType =
      if (aliases.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(aliases).map {
        case (f, a) => f.copy(name = a) })
    val props = new java.util.HashMap[String, String]()
    properties.foreach { case (k, v) => props.put(k, v) }
    comment.foreach(c => props.put(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT, c))
    val info = new ViewInfo(ident, sql, currentCatalog,
      currentNamespace.toArray, viewSchema, out.map(_.name).toArray,
      aliases.toArray, colComments.map(_.orNull).toArray, props)
    if (replace) catalog.replaceView(info, true)
    else if (allowExisting && catalog.viewExists(ident)) () // IF NOT EXISTS
    else catalog.createView(info)
    Seq.empty
  }
}

case class AlterGraftViewCommand(catalog: GraftCatalog,
                                 ident: Identifier,
                                 changes: Seq[ViewChange])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class DropGraftViewCommand(catalog: GraftCatalog,
                                ident: Identifier,
                                ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class RenameGraftViewCommand(catalog: GraftCatalog,
                                  ident: Identifier,
                                  newIdent: Identifier)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.renameView(ident, newIdent)
    Seq.empty
  }
}

/** `SHOW CREATE TABLE` over a view: the canonical re-creatable DDL
  * (name, declared column list, properties, defining SQL). */
case class ShowCreateGraftViewCommand(catalogName: String,
                                      ident: Identifier,
                                      vd: GraftViews.ViewData,
                                      override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val name = (catalogName +: ident.namespace().toSeq :+ ident.name())
      .mkString(".")
    val cols =
      if (vd.columnAliases.isEmpty) ""
      else vd.columnAliases.mkString(" (", ", ", ")")
    val props =
      if (vd.properties.isEmpty) ""
      else vd.properties.toSeq.sorted
        .map { case (k, v) => s"'$k' = '$v'" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(s"CREATE VIEW $name$cols$props AS\n${vd.sql}"))
  }
}

case class ShowGraftViewsCommand(catalog: GraftCatalog,
                                 namespace: Seq[String],
                                 pattern: Option[String],
                                 override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = catalog.listViews(namespace: _*).toSeq.map(_.name())
    val shown = pattern.map(p =>
      org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p)).getOrElse(names)
    shown.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}
