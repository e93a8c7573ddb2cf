package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Drain a [[graft.sources.VersionedTable]]'s change data feed as a
  * resumable stream: a durable checkpoint remembers the last-consumed
  * version, and each [[drain]] emits every commit published since —
  * one feed DataFrame per version transition — then advances the
  * checkpoint. The table-layer twin of [[IncrementalIngest]]: that
  * object streams files INTO a table; this one streams committed
  * changes OUT of it, so a downstream consumer (warehouse sync, MV in
  * another system, audit log) follows the table incrementally instead
  * of re-reading snapshots and diffing by hand.
  *
  * Semantics mirror a Structured Streaming source over the commit log
  * (Delta's `readChangeFeed` stream): the unit of progress is the
  * COMMIT, offsets are version numbers, and `Trigger.AvailableNow`
  * style draining (consume everything pending, then stop) is the
  * cron-friendly shape. The first drained version has no predecessor
  * to diff against, so it is emitted as its snapshot-as-inserts — a
  * consumer that folds every emitted feed from an empty state
  * reconstructs the exact table snapshot (gate query
  * q_table_change_stream pins this end to end).
  *
  * Delivery is at-least-once against an arbitrary sink (the checkpoint
  * advances only AFTER the sink returns, so a crash mid-sink replays
  * that version) and exactly-once via [[drainToVersionedTable]], whose
  * per-version marker makes the replayed commit a no-op — the same
  * idempotence-publish discipline as
  * [[IncrementalIngest.drainToVersionedTable]].
  *
  * Cost at 100 TB: each emitted feed reads O(changed files) by
  * manifest diff ([[VersionedTable.readChanges]]), never the table;
  * the checkpoint is one tiny file; and a drain that finds nothing new
  * does no data I/O at all. Reference analog: the basename-watermark
  * incremental re-read of `ApplaudoETL.scala:61-66`, lifted from
  * "which FILES are new" to "which COMMITTED CHANGES are new".
  */
object TableChangeStream {

  private def offsetPath(checkpointDir: String) =
    new Path(checkpointDir, "offset")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The last version a [[drain]] fully delivered (sink returned and
    * checkpoint advanced); None before the first successful emit. */
  def lastConsumed(spark: SparkSession,
                   checkpointDir: String): Option[Int] = {
    val p = offsetPath(checkpointDir)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(bytes.toString("UTF-8").trim.toInt)
      } finally in.close()
    }
  }

  /** Atomic checkpoint advance: temp + rename, the same publish
    * discipline as the table's own manifests — a crash leaves either
    * the old offset or the new one, never a torn file. */
  private def advance(spark: SparkSession, checkpointDir: String,
                      v: Int): Unit = {
    val target = offsetPath(checkpointDir)
    val f = fs(spark, target)
    f.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".tmp-offset-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, target)) {
      // rename-over-existing is not atomic-replace on every FS: delete
      // the stale offset first, then publish (single-writer per
      // checkpoint dir, so the window is crash-safe, not race-prone —
      // a crash between delete and rename re-delivers, which
      // at-least-once already permits)
      f.delete(target, false)
      require(f.rename(tmp, target), s"cannot publish offset $v")
    }
  }

  /** The change feed that version `v` introduced: the diff from its
    * predecessor in the commit log, or — for the table's FIRST version
    * — its snapshot grouped as inserts (schema identical to
    * [[VersionedTable.readChanges]]: the row columns plus `change` and
    * `n`), so folding every feed from version one rebuilds the table. */
  def feedFor(spark: SparkSession, table: String, v: Int): DataFrame = {
    val vs = VersionedTable.versions(spark, table)
    require(vs.contains(v), s"version $v not committed; have $vs")
    val idx = vs.indexOf(v)
    // layout-only commits (OPTIMIZE, CLUSTER BY) stamp
    // content_preserving=true: their logical snapshot is identical to
    // the predecessor's, so the feed is empty BY METADATA — without
    // the tag a consumer would read the whole rewrite twice just to
    // watch every copied row cancel in the multiset diff
    if (idx > 0 && VersionedTable
        .metaOf(VersionedTable.manifest(spark, table, v))
        .get("content_preserving").contains("true")) {
      val schema = VersionedTable.read(spark, table, Some(v)).schema
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("change",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    if (idx == 0) {
      // bootstrap: one insert row PER PHYSICAL ROW (n = 1) — a narrow
      // map over the snapshot, ZERO shuffle. Folding sums n, so this
      // is multiset-equivalent to the grouped form readChanges emits,
      // without paying a full-table groupBy to bootstrap a 100 TB
      // table's consumer.
      VersionedTable.read(spark, table, Some(v))
        .withColumn("change", lit("insert"))
        .withColumn("n", lit(1L))
    } else VersionedTable.readChanges(spark, table, vs(idx - 1), v)
  }

  /** Consume everything committed since the checkpoint: for each
    * pending version, in order, call `sink(feed, version)` and advance
    * the checkpoint once the sink returns. Returns the number of
    * versions delivered (0 = already caught up). A sink failure stops
    * the drain with the checkpoint at the last delivered version, so
    * the next drain resumes exactly there — at-least-once for the
    * failed version, no loss, no skips.
    *
    * `maxVersions` RATE-LIMITS one drain (Delta's maxFilesPerTrigger
    * shape): a consumer resuming after a long outage caps each
    * trigger's work instead of replaying the whole backlog in one
    * unbounded batch — repeated drains converge to the head, each one
    * checkpointed, so a crash mid-catch-up loses at most one capped
    * batch of progress. */
  def drain(spark: SparkSession, table: String, checkpointDir: String,
            maxVersions: Int = Int.MaxValue)
           (sink: (DataFrame, Int) => Unit): Int = {
    val vs = VersionedTable.versions(spark, table)
    require(vs.nonEmpty, s"no committed versions in $table")
    val from = lastConsumed(spark, checkpointDir)
    from.foreach { c =>
      require(c <= vs.last,
        s"checkpoint at $c is ahead of the table head ${vs.last} — " +
          "wrong checkpoint dir for this table?")
      // a vacuum that retired the checkpointed version also destroyed
      // the diff chain between it and the surviving versions; emitting
      // the first survivor as snapshot-as-inserts here would
      // DOUBLE-COUNT everything already drained, so fail loudly
      // instead: retention must outlive consumers (don't vacuum past
      // your slowest checkpoint), else re-bootstrap the consumer
      require(vs.contains(c),
        s"checkpointed version $c was vacuumed from $table — the feed " +
          s"between $c and ${vs.head} is unrecoverable; re-bootstrap " +
          "(fresh checkpoint + fresh downstream state)")
    }
    require(maxVersions > 0, "maxVersions must be positive")
    val pending = vs.filter(v => from.forall(v > _)).take(maxVersions)
    pending.foreach { v =>
      sink(feedFor(spark, table, v), v)
      advance(spark, checkpointDir, v)
    }
    pending.size
  }

  /** EXACTLY-ONCE drain into another [[VersionedTable]]: each source
    * version's feed lands as one append commit on `destTable` (row
    * columns + `change` + `n` + `src_version`), guarded by a
    * per-source-version marker published under the dest table with the
    * same create-exclusive discipline as
    * [[IncrementalIngest.drainToVersionedTable]]'s batch markers. A
    * crash after the commit but before the checkpoint advance replays
    * the version on the next drain, sees its marker, and skips — the
    * dest never holds a feed twice. Feeds with no rows are skipped
    * entirely (a metadata-only commit would add noise versions).
    *
    * The dest is an ordinary versioned table: time-travel over it
    * replays the source's change history, and folding its rows by
    * signed `n` reconstructs any source snapshot — the audit-log /
    * outbox shape. */
  def drainToVersionedTable(spark: SparkSession, srcTable: String,
                            destTable: String,
                            checkpointDir: String): Int =
    drain(spark, srcTable, checkpointDir) { (feed, v) =>
      val marker = new Path(destTable, s"_feed/v$v")
      val f = fs(spark, marker)
      if (!f.exists(marker)) {
        // persist across the emptiness probe + commit: the feed is a
        // multiset diff over the changed files — without the persist
        // it is computed twice (once for isEmpty, once for the
        // write), doubling the drain's dominant cost
        val rows = feed.withColumn("src_version", lit(v))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!rows.isEmpty)
            VersionedTable.commit(spark, destTable, rows, append = true)
        } finally rows.unpersist(blocking = false)
        f.mkdirs(marker.getParent)
        f.create(marker, false).close() // idempotence publish
      }
    }

  /** Follow the table INTO A WAREHOUSE: drain each pending commit's
    * feed into a keyed JDBC table via
    * [[graft.sources.JdbcUpsertSink]] — inserts MERGE (keyed upsert),
    * pure deletes (a delete with no same-key insert in the same feed
    * — an update is a delete/insert pair and resolves to its upsert)
    * apply as one set-based `DELETE WHERE EXISTS`. Rows carry
    * `src_version` as the sink's order column, so the MERGE's
    * newer-than guard makes replays no-ops: the checkpoint gives
    * at-least-once, the guard + idempotent delete make it
    * exactly-once in effect. This is the zero-egress realization of
    * the reference's warehouse slot (`ApplaudoETL.scala:278-281`,
    * BigQuery): swap url/driver for the cloud endpoint and the same
    * drain keeps a warehouse copy following the lakehouse table
    * commit by commit, shipping O(changed rows) per sync. The sink
    * must be declared with `orderCols = Seq("src_version")`. */
  def drainToJdbc(spark: SparkSession, table: String,
                  checkpointDir: String,
                  sink: graft.sources.JdbcUpsertSink): Int = {
    require(sink.orderCols == Seq("src_version"),
      "declare the sink with orderCols = Seq(\"src_version\")")
    drain(spark, table, checkpointDir) { (feed, v) =>
      val keyCols = sink.keyCols
      // persist: the feed (a multiset diff over changed files) feeds
      // FOUR consumers below (two emptiness probes + two JDBC ships)
      // — without it each one recomputes the diff from scratch
      val cached = feed
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val inserts = cached.filter(col("change") === "insert")
          .drop("change", "n").withColumn("src_version", lit(v))
        val pureDeletes = cached.filter(col("change") === "delete")
          .select(keyCols.map(col): _*)
          .join(cached.filter(col("change") === "insert")
            .select(keyCols.map(col): _*), keyCols, "left_anti")
          // version-guarded: a replayed old delete can't take down a
          // row a later (already-applied) version re-inserted
          .withColumn("src_version", lit(v))
        if (!pureDeletes.isEmpty) sink.deleteKeys(pureDeletes)
        if (!inserts.isEmpty) sink.write(inserts)
      } finally cached.unpersist(blocking = false)
    }
  }

  /** [[VersionedTable.vacuum]] with CONSUMER-AWARE retention: never
    * retire a version any of `checkpointDirs`' drains still needs
    * (the checkpointed version itself must stay committed — both for
    * the wrong-dir/vacuumed guard and because the next pending
    * version's diff reads its manifest). `keepLast` is the floor; the
    * effective retention stretches back to the slowest consumer. A
    * checkpoint dir with no offset yet pins nothing: a fresh consumer
    * bootstraps from whatever earliest version survives (its fold
    * still reconstructs every later snapshot). The operational rule
    * "retention must outlive consumers" made mechanical. */
  def safeVacuum(spark: SparkSession, table: String, keepLast: Int,
                 checkpointDirs: Seq[String]): Unit = {
    val vs = VersionedTable.versions(spark, table)
    if (vs.isEmpty) return
    val pinned = checkpointDirs.flatMap(c => lastConsumed(spark, c))
    val needed = pinned.filter(vs.contains) // already-vacuumed = lost anyway
    val effective = needed.foldLeft(keepLast) { (k, c) =>
      math.max(k, vs.size - vs.indexOf(c))
    }
    VersionedTable.vacuum(spark, table, effective)
  }

  /** Fold a drained feed (rows + `change` + `n`, e.g. the dest table
    * of [[drainToVersionedTable]] or a union of emitted feeds) back
    * into table rows: net multiplicity per distinct row, dropping
    * rows whose inserts and deletes cancel. Output = the row columns
    * plus `n` (surviving copies) — group-compare it against the
    * snapshot grouped the same way to prove the feed is lossless. */
  def foldFeed(feed: DataFrame): DataFrame = {
    val valueCols = feed.columns.toSeq
      .filterNot(Set("change", "n", "src_version"))
    feed.groupBy(valueCols.map(col): _*)
      .agg(sum(when(col("change") === "insert", col("n"))
        .otherwise(-col("n"))).as("n"))
      .filter(col("n") > 0)
  }
}
