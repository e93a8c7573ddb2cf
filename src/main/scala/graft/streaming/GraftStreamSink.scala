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
      outputMode == OutputMode.Complete(),
      s"graft sink supports Append and Complete, got $outputMode")
    // identity for replay detection: stable across restarts when a
    // checkpoint exists; a checkpoint-less (temp-checkpoint) query
    // cannot restart, so a fresh identity loses nothing
    val appId = parameters.get("txnAppId").getOrElse {
      parameters.get("checkpointLocation")
        .map(c => "stream-" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(
            new org.apache.hadoop.fs.Path(c).toUri.getPath)))
        .getOrElse("stream-" +
          java.util.UUID.randomUUID().toString.take(12))
    }
    new GraftStreamSink(table, appId,
      append = outputMode == OutputMode.Append(),
      partitionColumns, parameters)
  }
}

private[streaming] class GraftStreamSink(table: String, appId: String,
                                         append: Boolean,
                                         partitionColumns: Seq[String],
                                         parameters: Map[String, String])
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-anchor the incremental frame as a plain batch (the addBatch
    // frame must not be re-planned — DeltaSink's own discipline)
    val spark = data.sparkSession
    val batch = org.apache.spark.sql.GraftStreamingBridge.batchFrame(
      spark, data.queryExecution.toRdd, data.schema)
    val statCols = parameters.get("statCols")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (partitionColumns.nonEmpty) {
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
    s"GraftStreamSink[$table, ${if (append) "append" else "complete"}]"
}
