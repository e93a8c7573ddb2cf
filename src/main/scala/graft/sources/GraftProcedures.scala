package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for table maintenance — the DSv2
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * (Iceberg's stored-procedure shape, native in Spark 4):
  *
  * {{{
  * CALL gt.system.optimize(`table` => 'events', target_rows => 500000)
  * CALL gt.system.vacuum('events', 10)
  * CALL gt.system.analyze('events', 'k,amount')
  * CALL gt.system.cluster_by('events', 'k,ts', 16)
  * CALL gt.system.maintain('events', 1000000)
  * CALL gt.system.purge_tombstones('events', 1000000)
  * CALL gt.system.tag('events', 'audit-close', 7)
  * CALL gt.system.drop_tag('events', 'audit-close')
  * }}}
  *
  * Each procedure delegates to the gated library operation
  * ([[VersionedTable.compactCommit]] / `vacuum` / `analyzeCommit` /
  * `clusterCommit` / `maintain` / `purgeTombstonesCommit` /
  * `tagVersion`), so SQL-operated tables get the same O(files)
  * metadata-decision maintenance the library API provides — a
  * SQL-only user can now run the whole table lifecycle (DDL, DML,
  * streaming, maintenance) without a single library call. Results
  * return as rows (version numbers, vacuum's retire/delete counts,
  * maintain's typed action report) via driver-side [[LocalScan]]s —
  * maintenance output is O(actions), never data-sized.
  */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] = Seq("optimize", "vacuum", "analyze",
    "cluster_by", "maintain", "purge_tombstones", "tag", "drop_tag",
    "restore", "clean_orphans", "vacuum_retention", "clone",
    "set_spec", "branch", "fast_forward", "cherry_pick",
    "drop_branch", "expire_branches", "adopt", "convert",
    "build_text_index", "drop_text_index", "refresh_text_index",
    "build_vector_index", "drop_vector_index", "refresh_vector_index",
    "refresh_mv", "add_generated_column", "resolve_txns")

  def load(warehouse: String, name: String): Option[UnboundProcedure] = {
    def pathOf(table: String): String = {
      val parts = table.split('.').toSeq
      parts.foreach(p => require(
        p.nonEmpty && !p.contains("/") && !p.contains("\\") &&
          p != ".." && !p.startsWith("."),
        s"illegal table identifier segment: $p"))
      // 't.branch_dev' addresses the branch — every maintenance
      // procedure (optimize, analyze, purge_tombstones, ...) then
      // works on a branch exactly as on a table. Only NON-FIRST
      // segments map (a branch needs a parent table; a top-level
      // table legitimately named 'branch_x' stays itself), and the
      // mapping applies only when the literal path is NOT itself a
      // table and the branch interpretation is grounded (the mapped
      // path or its parent table exists) — a nested table or
      // namespace legitimately named 'branch_metrics' stays
      // addressable, mirroring GraftCatalog.branchPathOf's guards.
      val unmapped = (warehouse +: parts).mkString("/")
      val mapped = parts.zipWithIndex.map { case (p, i) =>
        if (i > 0 && p.startsWith("branch_") &&
            p.length > "branch_".length)
          "_branch/" + p.substring("branch_".length)
        else p
      }
      val mappedPath = (warehouse +: mapped).mkString("/")
      def isTbl(p: String): Boolean =
        try VersionedTable.versions(SparkSession.active, p).nonEmpty
        catch { case _: java.io.FileNotFoundException => false }
      if (mappedPath == unmapped || isTbl(unmapped)) unmapped
      else {
        val firstMapped = parts.indices
          .find(i => mapped(i) != parts(i)).get
        val parentPath =
          (warehouse +: parts.take(firstMapped)).mkString("/")
        if (isTbl(mappedPath) || isTbl(parentPath)) mappedPath
        else unmapped
      }
    }
    def spark = SparkSession.active
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    val versionOut = StructType(Seq(StructField("version", LongType,
      nullable = false)))
    def versionRow(v: Int): Seq[InternalRow] =
      Seq(new GenericInternalRow(Array[Any](v.toLong)))

    name match {
      case "optimize" => Some(proc("optimize",
        "compact small files into right-sized ones (one atomic commit)",
        Seq(in("table", StringType),
          in("target_rows", LongType, Some("1000000"))),
        versionOut) { r =>
        versionRow(VersionedTable.compactCommit(spark,
          pathOf(str(r, 0)), r.getLong(1)))
      })
      case "vacuum" => Some(proc("vacuum",
        "retire history older than the last keep_last versions",
        Seq(in("table", StringType), in("keep_last", IntegerType)),
        StructType(Seq(
          StructField("retired_versions", IntegerType, nullable = false),
          StructField("deleted_files", IntegerType, nullable = false)))) { r =>
        // ONE metadata walk: vacuum reports what it acted on itself —
        // no pre-flight dryRun duplicating the retire/live arithmetic
        val (retired, dead) = VersionedTable.vacuum(spark,
          pathOf(str(r, 0)), r.getInt(1))
        Seq(new GenericInternalRow(Array[Any](retired.size, dead.size)))
      })
      case "analyze" => Some(proc("analyze",
        "backfill per-file column statistics (metadata-only commit)",
        Seq(in("table", StringType), in("columns", StringType)),
        versionOut) { r =>
        versionRow(VersionedTable.analyzeCommit(spark, pathOf(str(r, 0)),
          str(r, 1).split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
      })
      case "cluster_by" => Some(proc("cluster_by",
        "re-lay the table along 1..8 columns (range / Z-order)",
        Seq(in("table", StringType), in("columns", StringType),
          in("n_files", IntegerType, Some("8"))),
        versionOut) { r =>
        versionRow(VersionedTable.clusterCommit(spark, pathOf(str(r, 0)),
          str(r, 1).split(',').toSeq.map(_.trim).filter(_.nonEmpty),
          r.getInt(2)))
      })
      case "maintain" => Some(proc("maintain",
        "policy-driven auto-maintenance (analyze/purge/optimize/recluster)",
        Seq(in("table", StringType),
          in("target_rows", LongType, Some("1000000"))),
        StructType(Seq(StructField("kind", StringType, nullable = false),
          StructField("detail", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))) { r =>
        VersionedTable.maintain(spark, pathOf(str(r, 0)), r.getLong(1))
          .map(a => new GenericInternalRow(Array[Any](
            UTF8String.fromString(a.kind), UTF8String.fromString(a.detail),
            a.version.toLong)))
      })
      case "add_generated_column" => Some(proc("add_generated_column",
        "ADD COLUMN ... GENERATED ALWAYS AS (expr): metadata-only " +
          "evolve; old files compute the expression at read, writes " +
          "materialize and validate it",
        Seq(in("table", StringType), in("column", StringType),
          in("type", StringType), in("expr", StringType)),
        versionOut) { r =>
        versionRow(VersionedTable.addGeneratedColumnCommit(spark,
          pathOf(str(r, 0)), str(r, 1),
          org.apache.spark.sql.types.DataType.fromDDL(str(r, 2)),
          str(r, 3)))
      })
      case "resolve_txns" => Some(proc("resolve_txns",
        "resolve crashed multi-table transactions on a table: abort " +
          "in-flight markers, seal committed ones, free version slots",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("action", StringType,
          nullable = false)))) { r =>
        TableTxn.resolvePending(spark, pathOf(str(r, 0)))
          .map(a => new GenericInternalRow(
            Array[Any](UTF8String.fromString(a))))
      })
      case "refresh_mv" => Some(proc("refresh_mv",
        "incrementally refresh a materialized view to its sources' " +
          "heads (I/O O(changed files), never a source rescan)",
        Seq(in("view", StringType)),
        versionOut) { r =>
        versionRow(GraftMv.refreshMv(spark, pathOf(str(r, 0))))
      })
      case "build_text_index" => Some(proc("build_text_index",
        "build (or rebuild) the text-anchor file-skipping index",
        Seq(in("table", StringType), in("column", StringType)),
        StructType(Seq(StructField("sidecar", StringType,
          nullable = false)))) { r =>
        val dir = VersionedTable.textIndexBuild(spark,
          pathOf(str(r, 0)), str(r, 1))
        Seq(new GenericInternalRow(Array[Any](UTF8String.fromString(dir))))
      })
      case "drop_text_index" => Some(proc("drop_text_index",
        "drop a column's text-anchor index (idempotent)",
        Seq(in("table", StringType), in("column", StringType)),
        StructType(Seq(StructField("dropped", BooleanType,
          nullable = false)))) { r =>
        VersionedTable.textIndexDrop(spark, pathOf(str(r, 0)), str(r, 1))
        Seq(new GenericInternalRow(Array[Any](true)))
      })
      case "refresh_text_index" => Some(proc("refresh_text_index",
        "extend the text index to un-indexed files (one pass over " +
          "the new files, never a corpus rebuild)",
        Seq(in("table", StringType), in("column", StringType)),
        StructType(Seq(StructField("files_covered", IntegerType,
          nullable = false)))) { r =>
        Seq(new GenericInternalRow(Array[Any](
          VersionedTable.textIndexRefresh(spark, pathOf(str(r, 0)),
            str(r, 1)))))
      })
      case "refresh_vector_index" => Some(proc("refresh_vector_index",
        "assign un-indexed files' vectors to the existing centroids " +
          "(O(new rows), no refit)",
        Seq(in("table", StringType), in("column", StringType)),
        StructType(Seq(StructField("files_covered", IntegerType,
          nullable = false)))) { r =>
        Seq(new GenericInternalRow(Array[Any](
          VersionedTable.vectorIndexRefresh(spark, pathOf(str(r, 0)),
            str(r, 1)))))
      })
      case "build_vector_index" => Some(proc("build_vector_index",
        "build (or rebuild) the persisted IVF vector index",
        Seq(in("table", StringType), in("id_column", StringType),
          in("vector_column", StringType),
          in("clusters", IntegerType, Some("16")),
          in("iters", IntegerType, Some("3"))),
        StructType(Seq(StructField("sidecar", StringType,
          nullable = false)))) { r =>
        val dir = VersionedTable.vectorIndexBuild(spark,
          pathOf(str(r, 0)), str(r, 1), str(r, 2), r.getInt(3),
          r.getInt(4))
        Seq(new GenericInternalRow(Array[Any](UTF8String.fromString(dir))))
      })
      case "drop_vector_index" => Some(proc("drop_vector_index",
        "drop a column's persisted vector index (idempotent)",
        Seq(in("table", StringType), in("column", StringType)),
        StructType(Seq(StructField("dropped", BooleanType,
          nullable = false)))) { r =>
        VersionedTable.vectorIndexDrop(spark, pathOf(str(r, 0)),
          str(r, 1))
        Seq(new GenericInternalRow(Array[Any](true)))
      })
      case "purge_tombstones" => Some(proc("purge_tombstones",
        "materialize deletion-vector debt back into pure files",
        Seq(in("table", StringType),
          in("target_rows", LongType, Some("1000000"))),
        versionOut) { r =>
        versionRow(VersionedTable.purgeTombstonesCommit(spark,
          pathOf(str(r, 0)), r.getLong(1)))
      })
      case "tag" => Some(proc("tag",
        "pin a version under a name (vacuum keeps it)",
        Seq(in("table", StringType), in("name", StringType),
          in("version", LongType)),
        StructType(Seq(StructField("tagged", BooleanType,
          nullable = false)))) { r =>
        VersionedTable.tagVersion(spark, pathOf(str(r, 0)), str(r, 1),
          r.getLong(2).toInt)
        Seq(new GenericInternalRow(Array[Any](true)))
      })
      case "restore" => Some(proc("restore",
        "roll the head back to an old version (as a NEW commit — " +
          "history stays intact)",
        Seq(in("table", StringType), in("version", LongType)),
        versionOut) { r =>
        versionRow(VersionedTable.restoreCommit(spark,
          pathOf(str(r, 0)), r.getLong(1).toInt))
      })
      case "drop_tag" => Some(proc("drop_tag",
        "drop a named version pin (idempotent)",
        Seq(in("table", StringType), in("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType,
          nullable = false)))) { r =>
        VersionedTable.dropTag(spark, pathOf(str(r, 0)), str(r, 1))
        Seq(new GenericInternalRow(Array[Any](true)))
      })
      case "vacuum_retention" => Some(proc("vacuum_retention",
        "retire history older than a TIME window (keeps every version" +
          " committed inside it, plus the head and tag pins) — the " +
          "policy operators actually state, commit-rate independent",
        Seq(in("table", StringType),
          in("retention_hours", LongType, Some("168"))),
        StructType(Seq(
          StructField("retired_versions", IntegerType, nullable = false),
          StructField("deleted_files", IntegerType, nullable = false)))) { r =>
        val (retired, dead) = VersionedTable.vacuumRetention(spark,
          pathOf(str(r, 0)), r.getLong(1) * 3600L * 1000L)
        Seq(new GenericInternalRow(Array[Any](retired.size, dead.size)))
      })
      case "clone" => Some(proc("clone",
        "shallow-clone a table snapshot into a NEW table: one manifest " +
          "write referencing the source's files verbatim, zero data " +
          "copy at any size — the fork-a-100TB-table-and-experiment " +
          "primitive (version <= 0 means the source head)",
        Seq(in("source", StringType), in("target", StringType),
          in("version", LongType, Some("0"))),
        versionOut) { r =>
        versionRow(VersionedTable.cloneCommit(spark, pathOf(str(r, 1)),
          pathOf(str(r, 0)),
          Some(r.getLong(2).toInt).filter(_ > 0)))
      })
      case "convert" => Some(proc("convert",
        "convert a plain parquet directory into a versioned table IN " +
          "PLACE: manifest v1 over the existing files, zero data I/O " +
          "(a warehouse-relative name or a filesystem path); the dir " +
          "is then readable as a table immediately",
        Seq(in("source", StringType)), versionOut) { r =>
        val src = str(r, 0)
        val p = if (src.contains("/")) src else pathOf(src)
        versionRow(VersionedTable.convertCommit(spark, p))
      })
      case "adopt" => Some(proc("adopt",
        "onboard parquet into the table: source (a filesystem path) " +
          "may be a plain parquet directory — converted in place " +
          "first, zero data I/O — or a versioned table; its snapshot " +
          "files MOVE into the table under one atomic publish, " +
          "validated against the table's schema and constraints",
        Seq(in("table", StringType), in("source", StringType),
          in("append", BooleanType, Some("true"))),
        versionOut) { r =>
        val src = str(r, 1)
        if (VersionedTable.versions(spark, src).isEmpty)
          VersionedTable.convertCommit(spark, src)
        versionRow(VersionedTable.adoptCommit(spark, pathOf(str(r, 0)),
          src, append = r.getBoolean(2)))
      })
      case "branch" => Some(proc("branch",
        "fork a writable branch from the head (or version <= 0 = " +
          "head): one manifest write, zero data copy; read/write it " +
          "as gt.<table>.branch_<name> or VERSION AS OF '<name>'",
        Seq(in("table", StringType), in("name", StringType),
          in("version", LongType, Some("0"))),
        StructType(Seq(StructField("base_version", LongType,
          nullable = false)))) { r =>
        val base = VersionedTable.branchCommit(spark, pathOf(str(r, 0)),
          str(r, 1), Some(r.getLong(2).toInt).filter(_ > 0))
        Seq(new GenericInternalRow(Array[Any](base.toLong)))
      })
      case "fast_forward" => Some(proc("fast_forward",
        "publish a branch: its head becomes the table's next version " +
          "(branch-era files move in atomically; refused when the " +
          "table advanced past the branch base)",
        Seq(in("table", StringType), in("name", StringType)),
        versionOut) { r =>
        versionRow(VersionedTable.fastForwardCommit(spark,
          pathOf(str(r, 0)), str(r, 1)))
      })
      case "cherry_pick" => Some(proc("cherry_pick",
        "replay a branch's delta (appends, removals, tombstones " +
          "since the fork) onto the table's CURRENT head — the " +
          "diverged-main complement of fast_forward; refused loudly " +
          "when the two sides touched the same files",
        Seq(in("table", StringType), in("name", StringType)),
        versionOut) { r =>
        versionRow(VersionedTable.cherryPickCommit(spark,
          pathOf(str(r, 0)), str(r, 1)))
      })
      case "expire_branches" => Some(proc("expire_branches",
        "drop branches whose head is older than max_age_ms; a stale " +
          "branch with unpublished work refuses unless force => true",
        Seq(in("table", StringType), in("max_age_ms", LongType),
          in("force", BooleanType, Some("false"))),
        StructType(Seq(StructField("expired", StringType,
          nullable = false)))) { r =>
        VersionedTable.expireBranches(spark, pathOf(str(r, 0)),
          r.getLong(1), force = r.getBoolean(2))
          .map(n => new GenericInternalRow(
            Array[Any](UTF8String.fromString(n))))
      })
      case "drop_branch" => Some(proc("drop_branch",
        "drop a branch and its unpublished commits (idempotent)",
        Seq(in("table", StringType), in("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType,
          nullable = false)))) { r =>
        VersionedTable.dropBranch(spark, pathOf(str(r, 0)), str(r, 1))
        Seq(new GenericInternalRow(Array[Any](true)))
      })
      case "set_spec" => Some(proc("set_spec",
        "evolve the table's identity partition spec (metadata-only: " +
          "old files keep their old-era tags and stay prunable by " +
          "stats; new writes tag by the new spec; '' = unpartition)",
        Seq(in("table", StringType), in("columns", StringType)),
        versionOut) { r =>
        versionRow(VersionedTable.setSpecCommit(spark, pathOf(str(r, 0)),
          str(r, 1).split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
      })
      case "clean_orphans" => Some(proc("clean_orphans",
        "delete data/sidecar files no manifest references (crash " +
          "residue; only files older than retention_hours are touched" +
          " — younger ones may belong to a commit in flight)",
        Seq(in("table", StringType),
          in("retention_hours", LongType, Some("168"))),
        StructType(Seq(StructField("deleted_files", IntegerType,
          nullable = false)))) { r =>
        val dead = VersionedTable.cleanOrphans(spark, pathOf(str(r, 0)),
          r.getLong(1) * 3600L * 1000L)
        Seq(new GenericInternalRow(Array[Any](dead.size)))
      })
      case _ => None
    }
  }

  private def in(name: String, dt: DataType,
                 dflt: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    dflt.foreach(b.defaultValue)
    b.build()
  }

  /** One bound-on-sight procedure: args arrive in declared parameter
    * order, the body returns result rows, surfaced as one driver-side
    * [[LocalScan]]. */
  private def proc(procName: String, doc: String,
                   params: Seq[ProcedureParameter], out: StructType)
                  (body: InternalRow => Seq[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] =
        params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val result = body(input).toArray
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = result
          override def readSchema(): StructType = out
        }).iterator()
      }
    }
}

