package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.VersionedTable

/** `writeStream.format("graft").start(tablePath)` — the versioned
  * table as a STREAMING SINK, closing the loop the round-8 source
  * opened: `readStream → transform → writeStream` now composes
  * entirely in user code, no library drain calls.
  *
  * {{{
  * df.writeStream.format("graft")
  *   .option("checkpointLocation", ckpt)   // drives exactly-once
  *   //.option("txnAppId", "my-stream")    // override the identity
  *   //.outputMode("complete")             // snapshot-overwrite mode
  *   .start(tablePath)
  * }}}
  *
  * Semantics:
  *  - **Append** (default): each micro-batch lands as ONE atomic
  *    append commit — a version per batch, time-travel and the change
  *    feed see every batch boundary.
  *  - **Complete**: each batch REPLACES the snapshot (logical
  *    overwrite commit) — the natural shape for a streaming
  *    aggregation result table.
  *  - **Update** (requires `.option("mergeKeys", "<keyCol>")`): each
  *    batch UPSERTS by key — one idempotent
  *    [[VersionedTable.mergeCommitIdempotent]] per batch, so a
  *    streaming aggregation writes only its CHANGED keys instead of
  *    Complete's full snapshot rewrite (Delta's sink rejects Update
  *    outright; this is parity-plus). The batch must carry one row
  *    per key (a streaming aggregation does by construction); the
  *    first batch on an empty table bootstraps with a plain append.
  *    `statCols` DEFAULTS to the merge key in this mode: the upsert's
  *    touched-file probe decides from manifest st ranges, and without
  *    key stats every batch would pay a table-proportional stats scan
  *    — the difference between O(changed files) and O(table) per
  *    batch at 100 TB. An optional `.option("deleteColumn", c)` marks
  *    a boolean source column as a CDC delete flag: flagged keys are
  *    REMOVED from the table (the flag column itself is not stored),
  *    so an upstream change feed with deletes mirrors completely.
  *    Cost per batch: O(files whose key range admits a changed key)
  *    rewritten, the rest carried — never a snapshot rewrite.
  *  - **Exactly-once** across restarts via the table's own
  *    txnAppId/txnVersion contract ([[VersionedTable.commitIdempotent]],
  *    Delta's DeltaSink discipline): the sink's identity derives from
  *    the query checkpoint (stable across restarts, unique per
  *    query), the txnVersion is the micro-batch id, and a replayed
  *    batch — crash after commit, before the engine advanced its
  *    offset log — is a metadata-checked NO-OP. The record is commit
  *    metadata, atomic with the manifest publish.
  *
  * Cost shape at 100 TB: a batch writes O(batch) data + one manifest
  * line set; no read of existing table data (append) — the same
  * incremental discipline as [[IncrementalIngest]], now behind the
  * standard streaming API. V1 `Sink` seam for the same reason the
  * source uses V1: the batch can BE a library commit.
  */
class GraftStreamSinkProvider extends StreamSinkProvider {
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val table = parameters.getOrElse("path",
      sys.error("graft sink needs a path (the table dir)"))
    require(outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Complete() ||
      outputMode == OutputMode.Update(),
      s"graft sink supports Append, Complete and Update, got $outputMode")
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
    if (outputMode == OutputMode.Update()) {
      require(mergeKeys.size == 1,
        "Update mode upserts by key — pass .option(\"mergeKeys\", " +
          "\"<keyColumn>\") (exactly one column)")
      require(partitionColumns.isEmpty,
        "Update mode and partitionBy do not compose — the upsert " +
          "rewrite re-tags partitions itself on a partitioned table")
    }
    // identity for replay detection: stable across restarts when a
    // checkpoint exists; a checkpoint-less (temp-checkpoint) query
    // cannot restart, so a fresh identity loses nothing. The identity
    // is a 128-bit hash of the FULL checkpoint path — two distinct
    // queries appending to one table must never alias (a collision
    // would make the replay guard silently drop one query's batches),
    // so a 32-bit hash is not enough.
    val ckptPath = parameters.get("checkpointLocation")
      .map(c => new org.apache.hadoop.fs.Path(c).toUri.getPath)
    val appId = parameters.get("txnAppId").getOrElse {
      ckptPath
        .map { path =>
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          "stream-" + sha.take(16).map("%02x".format(_)).mkString
        }
        .getOrElse("stream-" +
          java.util.UUID.randomUUID().toString.take(12))
    }
    // the PRE-SHA identity this checkpoint would have derived (32-bit
    // murmur): a stream whose last batch committed under the old
    // formula must not replay it as new after an upgrade — the first
    // addBatch migrates the old watermark forward (once, idempotent)
    val legacyAppId =
      if (parameters.contains("txnAppId")) None
      else ckptPath.map(path => "stream-" +
        java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(path)))
    new GraftStreamSink(table, appId,
      append = outputMode == OutputMode.Append(),
      partitionColumns, parameters,
      mergeKey = if (outputMode == OutputMode.Update())
        Some(mergeKeys.head) else None,
      legacyAppId = legacyAppId)
  }
}

private[streaming] class GraftStreamSink(table: String, appId: String,
                                         append: Boolean,
                                         partitionColumns: Seq[String],
                                         parameters: Map[String, String],
                                         mergeKey: Option[String] = None,
                                         legacyAppId: Option[String] = None)
    extends Sink {

  private var migrated = false

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (!migrated) {
      // one-time identity upgrade: carry the legacy-formula replay
      // watermark into the current appId so a crash-replayed batch
      // committed under the old identity stays a no-op
      legacyAppId.foreach(old =>
        graft.sources.VersionedTable.migrateTxnAppId(
          data.sparkSession, table, old, appId))
      migrated = true
    }
    // re-anchor the incremental frame as a plain batch (the addBatch
    // frame must not be re-planned — DeltaSink's own discipline)
    val spark = data.sparkSession
    val batch = org.apache.spark.sql.GraftStreamingBridge.batchFrame(
      spark, data.queryExecution.toRdd, data.schema)
    // explicit .option("statCols", ...) wins; otherwise the table's
    // write.stats.columns property (one O(1) sidecar read per batch)
    // keeps streamed commits st-covered like every other SQL write
    val statCols = parameters.get("statCols")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(VersionedTable.declaredStatCols(spark, table,
        data.schema.fieldNames.toSeq))
    if (mergeKey.nonEmpty) {
      // Update mode: upsert the batch's changed keys. First batch on
      // a table with no versions bootstraps as an append (every key
      // is new); both paths sit behind the same replay guard. Key
      // stats default ON so every later batch's touched-file probe is
      // metadata-only (no per-batch stats scan).
      val deleteCol = parameters.get("deleteColumn")
      val keyStats = (statCols ++ mergeKey).distinct
      if (VersionedTable.versions(spark, table).isEmpty)
        VersionedTable.commitIdempotent(spark, table,
          deleteCol.fold(batch)(d =>
            batch.filter(!org.apache.spark.sql.functions.col(d))
              .drop(d)),
          append = false, appId = appId, txnVersion = batchId,
          statCols = keyStats)
      else
        // keyStats here too: a table that PRE-EXISTED without stats
        // still gains merge-key st coverage from this batch's rewrite,
        // so later batches' touched-file probes go metadata-only
        VersionedTable.mergeCommitIdempotent(spark, table, batch,
          mergeKey.get, appId = appId, txnVersion = batchId,
          deleteCol = deleteCol, statCols = keyStats)
    } else if (partitionColumns.nonEmpty) {
      // partitioned streaming writes: pt-tagged commits with the same
      // replay guard, via the partitioned idempotent path
      VersionedTable.commitPartitionedIdempotent(spark, table, batch,
        partitionColumns, append = append, appId = appId,
        txnVersion = batchId, statCols = statCols)
    } else {
      VersionedTable.commitIdempotent(spark, table, batch,
        append = append, appId = appId, txnVersion = batchId,
        statCols = statCols)
    }
    ()
  }

  override def toString: String =
    s"GraftStreamSink[$table, ${
      if (mergeKey.nonEmpty) s"update(${mergeKey.get})"
      else if (append) "append" else "complete"}]"
}
