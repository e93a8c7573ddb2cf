package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming near-duplicate detection: MinHash-LSH candidate pairs over
  * a DOCUMENT stream, with bucket membership kept in keyed state — the
  * ingest-time twin of [[graft.operators.Dedup.minhashCandidates]].
  * A batch pipeline asks "which documents in this corpus collide?";
  * an ingest pipeline asks "which PREVIOUSLY ADMITTED document does
  * this new one collide with, the moment it arrives?". Same LSH, but
  * the bucket index must persist across arrivals — exactly what
  * `flatMapGroupsWithState` state stores are for.
  *
  * Reference scope: carlossegovia/scala-etl-test models incremental
  * ingest as watermark-filtered batch re-reads (SURVEY.md §2.1/§2.8);
  * this is the idiomatic Structured Streaming upgrade of that idea
  * applied to the dedup tier.
  *
  * Scale shape: signatures are map-only codegen kernels per microbatch;
  * the only shuffle is groupByKey on (band, bucket) — the same key the
  * batch LSH groups on. State per bucket is a long[] of member ids,
  * bounded by `maxBucketIds`: a bucket contributes pairs only among
  * its first `maxBucketIds` members, then flips to overflowed (emits
  * nothing further, state truncated to a flag) — the streaming mirror
  * of the batch hot-bucket cap; boilerplate buckets would otherwise
  * grow state AND emit O(m^2) pairs forever. Pairs emitted before the
  * overflow are not retracted (append mode); an exact-capped result
  * needs the batch operator.
  *
  * State backend: the operator is provider-agnostic — at corpus scale
  * set `spark.sql.streaming.stateStore.providerClass` to the RocksDB
  * provider so bucket state lives off-heap/on-disk instead of in the
  * executor heap (spec-verified to produce identical pairs).
  */
object NearDupStream {

  case class BandedDoc(band: Int, bandKey: String, docId: Long)
  case class BucketState(ids: Array[Long], overflowed: Boolean)

  /** All candidate pairs (id_a < id_b, distinct) discovered over the
    * whole stream, via a memory sink drained with `Trigger.AvailableNow`
    * (multi-microbatch: state carries buckets across batches, so the
    * result is independent of how arrivals are batched). Equals the
    * batch `minhashCandidates` pair set when no bucket overflows —
    * property-tested in NearDupStreamSpec, gated as q_stream_neardup.
    */
  def candidatePairs(spark: SparkSession, dir: String, queryName: String,
                     shingleN: Int = 5, k: Int = 8, bands: Int = 4,
                     maxBucketIds: Int = 1024,
                     statePartitions: Option[Int] = Some(8),
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val schema = spark.read
      .parquet(s"$dir/documents.parquet").schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m =>
      reader.option("maxFilesPerTrigger", m.toString))
    // [] glob: accept both a file path and a directory of parts
    val docs = reader.parquet(s"$dir/documents.parque[t]")
    val banded = graft.operators.Dedup
      .lshBands(graft.operators.Dedup.minhashSignatures(
        docs, "doc_id", "text", shingleN, k), "doc_id", k, bands)
      .select(col("band"), col("band_key").as("bandKey"),
        col("doc_id").as("docId"))
      .as[BandedDoc]
    val pairs = banded
      .groupByKey(d => (d.band, d.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Array.empty, false))
          var ids = st.ids
          var over = st.overflowed
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          rows.foreach { d =>
            if (!over && !ids.contains(d.docId)) {
              if (ids.length >= maxBucketIds) {
                // overflow BEFORE emitting: the bucket contributes
                // pairs only among its first `maxBucketIds` members;
                // state truncates to the flag alone
                over = true
                ids = Array.empty
              } else {
                var i = 0
                while (i < ids.length) {
                  val p = ids(i)
                  out += ((math.min(p, d.docId), math.max(p, d.docId)))
                  i += 1
                }
                ids = ids :+ d.docId
              }
            }
          }
          state.update(BucketState(ids, over))
          out.iterator
      }
      .toDF("id_a", "id_b")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = pairs.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // distinct AFTER the sink: the same pair can surface in several
    // bands (batch does the same distinct)
    spark.table(queryName).distinct()
  }
}
