package graft.sources

import org.apache.spark.sql.DataFrame

/** Pluggable sinks (reference S7-S9, ApplaudoETL.scala:278-285: parquet
  * or console, "change storeData to store wherever"). */
trait Sink {
  def write(df: DataFrame): Unit
}

/** Overwrite-mode parquet directory per logical table (reference S7).
  * `partitionBy` is the 100 TB knob the reference lacks: partition by a
  * low-cardinality pruning column (e.g. date) so downstream reads prune
  * at the listing level. */
case class ParquetSink(resultPath: String, tableName: String,
                       partitionBy: Seq[String] = Nil) extends Sink {
  override def write(df: DataFrame): Unit = {
    val w = df.write.mode("overwrite")
    val p = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    p.parquet(s"$resultPath/$tableName")
  }
}

/** `show(n)` fallback when no result path is given (reference S8). */
case class ConsoleSink(rows: Int = 10) extends Sink {
  override def write(df: DataFrame): Unit = df.show(rows, truncate = false)
}

/** Idempotent partition backfill: overwrite ONLY the partitions
  * present in `df`, leaving every other partition untouched (dynamic
  * partitionOverwriteMode). The unit of reprocessing at scale is the
  * partition — a failed daily job re-runs for its day without
  * clobbering three years of siblings. */
case class PartitionBackfillSink(resultPath: String, tableName: String,
                                 partitionBy: Seq[String]) extends Sink {
  require(partitionBy.nonEmpty, "backfill needs partition columns")
  override def write(df: DataFrame): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(s"$resultPath/$tableName")
}

/** External warehouse sink over a live JDBC connection — the
  * reference's pluggable "store wherever" slot (S9, notebook cell 24:
  * BigQuery) realized against a real database: proven end-to-end vs an
  * embedded Derby (q_sink_jdbc round-trips write → server → read);
  * pointing url/driver at any warehouse JDBC endpoint is the
  * reference's intended swap. Zero-egress container rules out a cloud
  * endpoint itself.
  *
  * At scale: `df.write.jdbc` opens one connection per partition and
  * batches inserts — `coalesce` the frame to the warehouse's ingest
  * parallelism; `createTableColumnTypes` pins DDL types where the
  * dialect default (e.g. CLOB for strings on Derby) is wrong for the
  * target. */
case class JdbcSink(url: String, table: String, driver: String,
                    user: String = "", password: String = "",
                    createTableColumnTypes: Option[String] = None)
    extends Sink {
  override def write(df: DataFrame): Unit = {
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val w = df.write.mode("overwrite")
    createTableColumnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url, table, props)
  }
}

/** Generic file-format sink for the remaining Spark-native formats
  * (orc, json-lines, csv) — the reference's "change storeData to store
  * wherever" pluggability (S9) without a per-format class. Parquet
  * keeps its own sink as the default columnar path. */
case class FormatSink(resultPath: String, tableName: String,
                      format: String,
                      options: Map[String, String] = Map.empty,
                      partitionBy: Seq[String] = Nil) extends Sink {
  override def write(df: DataFrame): Unit = {
    val w = df.write.mode("overwrite").format(format).options(options)
    val p = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    p.save(s"$resultPath/$tableName")
  }
}

/** Idempotent keyed JDBC UPSERT sink — the warehouse MERGE pattern: the
  * micro-batch is staged through the distributed JDBC writer, then ONE
  * server-side MERGE folds it into the target with a newer-than guard
  * on `orderCols` (lexicographic), so batch replays and out-of-order
  * arrivals converge to the same final state (an older staged row can
  * never clobber a newer target row). Designed as the foreachBatch
  * sink of a streaming CDC drain; cloud warehouses are the same MERGE
  * with a different url/driver. */
case class JdbcUpsertSink(url: String, table: String, driver: String,
                          keyCols: Seq[String], orderCols: Seq[String],
                          createTableColumnTypes: Option[String] = None)
    extends Sink {
  // MERGE/CREATE SQL interpolates the table and column names — if they
  // ever arrive from untrusted config, an identifier like
  // `t; DROP TABLE x` would become live SQL. Reject anything but plain
  // SQL identifiers up front (quoting alone can't save the UNQUOTED
  // table name, which must stay unquoted so each warehouse applies its
  // own case folding — see the write() comments).
  private val SafeIdent = "[A-Za-z][A-Za-z0-9_]*".r
  require(SafeIdent.matches(table),
    s"unsafe table identifier: '$table'")
  require(keyCols.nonEmpty && orderCols.nonEmpty,
    "keyCols and orderCols must be non-empty")
  (keyCols ++ orderCols).foreach(c => require(SafeIdent.matches(c),
    s"unsafe column identifier: '$c'"))

  override def write(df0: DataFrame): Unit = {
    df0.columns.foreach(c => require(SafeIdent.matches(c),
      s"unsafe column identifier in frame: '$c'"))
    // Standard-SQL MERGE fails on multiple source matches per target
    // key, so the sink OWNS the per-key cut: keep only the newest row
    // per key (by orderCols desc) in this batch. Idempotent — a
    // pre-deduped batch passes through unchanged for one cheap
    // window over the (small) micro-batch.
    val dedupW = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(df0.col): _*)
      .orderBy(orderCols.map(df0.col(_).desc): _*)
    val df: DataFrame = df0
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(dedupW))
      .filter(org.apache.spark.sql.functions.col("__rn") === 1)
      .drop("__rn")
    // staging is deliberately left in place between batches: the next
    // batch's overwrite replaces it, and dropping it here would race a
    // concurrent reader's MERGE on some warehouses
    val staging = s"${table}_stg"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    val w = df.write.mode("overwrite")
    createTableColumnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url, staging, props)
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // Spark's JDBC writer creates QUOTED (case-exact) identifiers —
      // every driver-side reference must quote identically
      def q(n: String) = "\"" + n + "\""
      val cols = df.columns.toSeq
      // table NAMES pass through Spark's writer verbatim (unquoted —
      // each warehouse folds per its dialect: Derby upper, Postgres
      // lower); only COLUMN identifiers are quoted. Probe existence
      // case-insensitively so the CREATE runs exactly once anywhere.
      def probe(n: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, n, null)
        try rs.next() finally rs.close()
      }
      val tgtExists = probe(table) ||
        probe(table.toUpperCase(java.util.Locale.ROOT)) ||
        probe(table.toLowerCase(java.util.Locale.ROOT))
      val st = conn.createStatement()
      try {
        if (!tgtExists) {
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $staging WITH NO DATA")
          // key index: MERGE's ON probe and deleteKeys' EXISTS would
          // otherwise nested-loop the whole target per staged row
          // (measured: a 21k x 21k unindexed Derby MERGE took ~10 s
          // per sync). Best-effort — index DDL is the least portable
          // SQL there is, and it's a performance hint, not semantics.
          try st.executeUpdate(s"CREATE INDEX ${table}_kidx ON $table " +
            keyCols.map(q).mkString("(", ", ", ")"))
          catch { case _: java.sql.SQLException => () }
        }
        val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        val newer = orderCols.indices.map { i =>
          val eqs = (0 until i).map(j =>
            s"s.${q(orderCols(j))} = t.${q(orderCols(j))}")
          (eqs :+ s"s.${q(orderCols(i))} > t.${q(orderCols(i))}")
            .mkString("(", " AND ", ")")
        }.mkString(" OR ")
        val sets = cols.filterNot(keyCols.contains)
          .map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
        st.executeUpdate(
          s"""MERGE INTO $table t USING $staging s ON $on
             |WHEN MATCHED AND ($newer) THEN UPDATE SET $sets
             |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
             |  VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin)
      } finally st.close()
    } finally conn.close()
  }

  /** Server-side DELETE of every target row whose key appears in
    * `keys` (a frame carrying at least `keyCols`): stage the keys,
    * one `DELETE ... WHERE EXISTS` against the staging table —
    * distributed on the Spark side, a single set-based statement on
    * the warehouse side. When the frame ALSO carries the sink's
    * `orderCols`, the delete only takes rows the staged entry is
    * strictly newer than — the same lexicographic guard [[write]]'s
    * MERGE uses, so a REPLAYED old delete can never take down a row a
    * later version re-inserted. Deleting an absent key is a no-op
    * either way: replays are harmless. The warehouse half of CDC:
    * [[write]] applies the upserts, this applies the deletes. */
  def deleteKeys(keys0: DataFrame): Unit = {
    keys0.columns.foreach(c => require(SafeIdent.matches(c),
      s"unsafe column identifier in frame: '$c'"))
    val guarded = orderCols.forall(keys0.columns.contains)
    val keep = if (guarded) keyCols ++ orderCols else keyCols
    val keys = keys0.select(keep.map(keys0.col): _*).distinct()
    val staging = s"${table}_del"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    keys.write.mode("overwrite").jdbc(url, staging, props)
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      def q(n: String) = "\"" + n + "\""
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val newer =
        if (!guarded) ""
        else " AND (" + orderCols.indices.map { i =>
          val eqs = (0 until i).map(j =>
            s"s.${q(orderCols(j))} = t.${q(orderCols(j))}")
          (eqs :+ s"s.${q(orderCols(i))} > t.${q(orderCols(i))}")
            .mkString("(", " AND ", ")")
        }.mkString(" OR ") + ")"
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""DELETE FROM $table t WHERE EXISTS
           |  (SELECT 1 FROM $staging s WHERE $on$newer)""".stripMargin)
      finally st.close()
    } finally conn.close()
  }
}
