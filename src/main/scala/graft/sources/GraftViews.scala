package graft.sources

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{DataType, StructType}

/** Warehouse-persisted SQL VIEW metadata — the storage half of
  * [[GraftCatalog]]'s `ViewCatalog`. A view is one small line-oriented
  * file under `<warehouse>/_views/<namespace...>/<name>.view` holding
  * the defining SQL text plus the creation context (catalog + current
  * namespace, so relative table names inside the body resolve the way
  * the AUTHOR meant them), the captured schema, the declared column
  * aliases/comments, and properties. Values are URL-encoded so the
  * file stays one `k=v` pair per line whatever the SQL contains.
  *
  * Publish discipline: view files go through
  * [[VersionedTable.publishNoReplace]] — the SAME per-scheme
  * no-replace contract data commits use — so two concurrent
  * `CREATE VIEW` of one name cannot both "win" with one definition
  * silently vanishing. `CREATE OR REPLACE` deletes then republishes
  * (a metadata swap; a crash in between loses only the view
  * definition, which the statement was replacing anyway).
  *
  * Views resolve at READ time against the CURRENT table state —
  * Spark's default look-through semantics (the stored schema is the
  * creation-time record DESCRIBE shows, not a frozen contract).
  */
object GraftViews {

  /** Everything a stored view definition carries. `columnComments`
    * aligns with `columnAliases` (None = no comment declared). */
  final case class ViewData(sql: String,
                            currentCatalog: String,
                            currentNamespace: Seq[String],
                            schemaJson: String,
                            queryColumnNames: Seq[String],
                            columnAliases: Seq[String],
                            columnComments: Seq[Option[String]],
                            properties: Map[String, String],
                            comment: Option[String]) {
    def schema: StructType =
      DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")
  // URLEncoder escapes '~' (%7E), so a bare '~' can only be the None
  // sentinel and a bare ',' only a separator
  private def encOpt(o: Option[String]): String = o.map(enc).getOrElse("~")
  private def decOpt(s: String): Option[String] =
    if (s == "~") None else Some(dec(s))
  private def encSeq(xs: Seq[String]): String = xs.map(enc).mkString(",")
  private def decSeq(s: String): Seq[String] =
    if (s.isEmpty) Seq.empty else s.split(",", -1).toSeq.map(dec)

  private[sources] def viewsDir(warehouse: String): Path =
    new Path(warehouse, "_views")

  private def checkSegments(ident: Identifier): Unit =
    (ident.namespace().toSeq :+ ident.name()).foreach(p => require(
      p.nonEmpty && !p.contains("/") && !p.contains("\\") && p != ".." &&
        !p.startsWith("."),
      s"illegal view identifier segment: $p"))

  private def fileOf(warehouse: String, ident: Identifier): Path = {
    checkSegments(ident)
    new Path((viewsDir(warehouse).toString +: ident.namespace().toSeq)
      .mkString("/"), ident.name() + ".view")
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, warehouse: String,
             ident: Identifier): Boolean = {
    val p = fileOf(warehouse, ident)
    fs(spark, p).exists(p)
  }

  def load(spark: SparkSession, warehouse: String,
           ident: Identifier): Option[ViewData] = {
    val p = fileOf(warehouse, ident)
    val f = fs(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val raw = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
    val kv = raw.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('=')
      l.take(i) -> l.drop(i + 1)
    }.toSeq
    val m = kv.toMap
    require(m.get("format").contains("graft-view-1"),
      s"$p is not a graft view file")
    Some(ViewData(
      sql = dec(m("sql")),
      currentCatalog = dec(m("catalog")),
      currentNamespace = decSeq(m.getOrElse("namespace", "")),
      schemaJson = dec(m("schema")),
      queryColumnNames = decSeq(m.getOrElse("queryColumnNames", "")),
      columnAliases = decSeq(m.getOrElse("columnAliases", "")),
      columnComments = {
        val s = m.getOrElse("columnComments", "")
        if (s.isEmpty) Seq.empty
        else s.split(",", -1).toSeq.map(decOpt)
      },
      properties = kv.collect { case (k, v) if k.startsWith("prop.") =>
        dec(k.substring(5)) -> dec(v) }.toMap,
      comment = decOpt(m.getOrElse("comment", "~"))))
  }

  /** Persist `vd` as `ident`. `replace = false` is CREATE-exclusive
    * through the per-scheme no-replace publish — returns false when a
    * concurrent creator won (never silently overwrites). `replace =
    * true` swaps the definition. */
  def store(spark: SparkSession, warehouse: String, ident: Identifier,
            vd: ViewData, replace: Boolean): Boolean = {
    val target = fileOf(warehouse, ident)
    val f = fs(spark, target)
    f.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${ident.name()}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val lines = Seq(
      "format=graft-view-1",
      "sql=" + enc(vd.sql),
      "catalog=" + enc(vd.currentCatalog),
      "namespace=" + encSeq(vd.currentNamespace),
      "schema=" + enc(vd.schemaJson),
      "queryColumnNames=" + encSeq(vd.queryColumnNames),
      "columnAliases=" + encSeq(vd.columnAliases),
      "columnComments=" + vd.columnComments.map(encOpt).mkString(","),
      "comment=" + encOpt(vd.comment)) ++
      vd.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"prop.${enc(k)}=${enc(v)}" }
    val out = f.create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (replace) f.delete(target, false)
    val ok = VersionedTable.publishNoReplace(f, tmp, target)
    if (!ok) f.delete(tmp, false)
    ok
  }

  def drop(spark: SparkSession, warehouse: String,
           ident: Identifier): Boolean = {
    val p = fileOf(warehouse, ident)
    fs(spark, p).delete(p, false)
  }

  /** The views under `namespace` — O(views) small-file listing. */
  def list(spark: SparkSession, warehouse: String,
           namespace: Seq[String]): Seq[Identifier] = {
    val dir = new Path(
      (viewsDir(warehouse).toString +: namespace).mkString("/"))
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".view") &&
        !s.getPath.getName.startsWith("."))
      .map(s => Identifier.of(namespace.toArray,
        s.getPath.getName.stripSuffix(".view")))
  }
}
