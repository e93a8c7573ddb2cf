package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.VersionedTable

/** [[GraftStreamSinkProvider]]: the versioned table as a streaming
  * SINK — per-batch atomic commits, exactly-once across restarts via
  * the txn contract, complete-mode snapshot replacement, partitioned
  * writes, and the full readStream → writeStream loop. */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString

  test("file stream -> graft sink: each batch one commit; restart no-op") {
    val w = fresh("gsk"); val src = s"$w/src"; val dest = s"$w/dest"
    val ckpt = s"$w/ckpt"
    new java.io.File(src).mkdirs()
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.parquet(s"$src/b0")
    def drainOnce(): Unit = {
      val q = spark.readStream.schema("k LONG, v LONG")
        .parquet(s"$src/*")
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dest)
      q.awaitTermination()
    }
    drainOnce()
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
    val v1 = VersionedTable.versions(spark, dest)
    // restart with nothing new: no extra commit, no doubled rows
    drainOnce()
    assert(VersionedTable.versions(spark, dest) == v1,
      "an empty restart must not commit")
    // new data: lands as the next version
    Seq((3L, 30L)).toDF("k", "v").write.parquet(s"$src/b1")
    drainOnce()
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("identity upgrade: a batch committed under the legacy murmur " +
    "appId stays a no-op after the SHA identity change") {
    val w = fresh("gskm"); val dest = s"$w/dest"; val ckpt = s"$w/ckpt"
    // a pre-upgrade sink committed batch 5 under the 32-bit murmur
    // identity this checkpoint path derives
    val ckptPath = new org.apache.hadoop.fs.Path(ckpt).toUri.getPath
    val legacy = "stream-" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(ckptPath))
    VersionedTable.commitIdempotent(spark, dest,
      Seq((1L, 10L)).toDF("k", "v"), append = true,
      appId = legacy, txnVersion = 5L)
    // the canonical replay window: crash AFTER the manifest publish,
    // BEFORE the cache write — the cache lags the authoritative
    // manifest record; migration must carry the MANIFEST's watermark
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dest, "_txn", legacy),
      "4\n".getBytes("UTF-8"))
    val v1 = VersionedTable.versions(spark, dest)
    // post-upgrade sink for the SAME checkpoint: crash-replay of
    // batch 5 must be a metadata no-op, not a duplicate commit
    val sink = new GraftStreamSinkProvider().createSink(
      spark.sqlContext, Map("path" -> dest,
        "checkpointLocation" -> ckpt), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(5L, Seq((1L, 10L)).toDF("k", "v"))
    assert(VersionedTable.versions(spark, dest) == v1,
      "the replayed pre-upgrade batch must not re-commit")
    // and a genuinely NEW batch still lands under the new identity
    sink.addBatch(6L, Seq((2L, 20L)).toDF("k", "v"))
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
    // an explicit txnAppId option opts out of the migration entirely
    val explicit = new GraftStreamSinkProvider().createSink(
      spark.sqlContext, Map("path" -> dest,
        "checkpointLocation" -> ckpt, "txnAppId" -> "my-app"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    explicit.addBatch(5L, Seq((3L, 30L)).toDF("k", "v"))
    assert(VersionedTable.read(spark, dest).count() == 3L,
      "an explicit appId is its own replay domain")
  }

  test("migration fires only off the legacy _txn cache file: a " +
    "manifest record alone cannot be inherited by a colliding new query") {
    val w = fresh("gskg"); val dest = s"$w/dest"
    // ANOTHER query's legacy identity committed batch 5 here, and its
    // cache file is gone (or never belonged to this checkpoint at all
    // — the murmur-collision scenario)
    val legacy = "stream-deadbeef"
    VersionedTable.commitIdempotent(spark, dest,
      Seq((1L, 10L)).toDF("k", "v"), append = true,
      appId = legacy, txnVersion = 5L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dest, "_txn", legacy))
    VersionedTable.migrateTxnAppId(spark, dest, legacy, "new-app")
    // no watermark must have been carried: the new identity's batch 0
    // COMMITS instead of silently no-op'ing against v5's record
    VersionedTable.commitIdempotent(spark, dest,
      Seq((2L, 20L)).toDF("k", "v"), append = true,
      appId = "new-app", txnVersion = 0L)
    assert(VersionedTable.read(spark, dest).count() == 2L,
      "a cache-less legacy record must not no-op a new query's batches")
  }

  test("replayed batch is a no-op: same txnVersion commits once") {
    val w = fresh("gskr"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "replay-spec",
      append = true, Seq.empty, Map.empty)
    val b = Seq((1L, 1L)).toDF("k", "v")
    sink.addBatch(0L, b)
    sink.addBatch(0L, b) // crash-replay of the same micro-batch
    sink.addBatch(1L, Seq((2L, 2L)).toDF("k", "v"))
    assert(VersionedTable.versions(spark, dest) == Seq(1, 2))
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 1L), (2L, 2L)))
  }

  test("complete mode replaces the snapshot per batch") {
    val w = fresh("gskc"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "complete-spec",
      append = false, Seq.empty, Map.empty)
    sink.addBatch(0L, Seq((1L, 1L)).toDF("k", "n"))
    sink.addBatch(1L, Seq((1L, 3L), (2L, 1L)).toDF("k", "n"))
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 3L), (2L, 1L)),
      "the head must be batch 1's snapshot alone")
    assert(VersionedTable.read(spark, dest, Some(1)).as[(Long, Long)]
      .collect().toSet == Set((1L, 1L)), "batch 0 still time-travels")
  }

  test("partitioned sink commits pt-tagged files") {
    val w = fresh("gskp"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "part-spec",
      append = true, Seq("g"), Map.empty)
    sink.addBatch(0L,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "g"))
    val tags = VersionedTable.partitionsOf(
      VersionedTable.manifest(spark, dest, 1)).map(_._2).distinct.sorted
    assert(tags == Seq("a", "b"), s"got $tags")
    assert(VersionedTable.readPartitions(spark, dest, "g", Seq("a"))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L))
  }

  test("graft source -> graft sink: the loop composes end to end") {
    val w = fresh("gskl"); val a = s"$w/a"; val b = s"$w/b"
    val ckpt = s"$w/ckpt"
    VersionedTable.commit(spark, a,
      (1L to 40L).map(k => (k, k * 2)).toDF("k", "v"), append = false)
    VersionedTable.commit(spark, a,
      Seq((100L, 7L)).toDF("k", "v"), append = true)
    def pump(): Unit = {
      val q = spark.readStream.format("graft")
        .option("mode", "inserts").load(a)
        .filter(col("k") % 2 === 0)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(b)
      q.awaitTermination()
    }
    pump()
    // a further source commit flows through on the next trigger
    VersionedTable.commit(spark, a,
      Seq((102L, 9L), (103L, 9L)).toDF("k", "v"), append = true)
    pump()
    val got = VersionedTable.read(spark, b).as[(Long, Long)]
      .collect().toSet
    val want = ((1L to 40L).map(k => (k, k * 2)) ++
      Seq((100L, 7L), (102L, 9L))).filter(_._1 % 2 == 0).toSet
    assert(got == want, s"diff: ${got diff want} / ${want diff got}")
  }

  test("Update mode: streaming aggregation upserts only changed keys") {
    val w = fresh("gsku"); val src = s"$w/src"; val dest = s"$w/dest"
    val ckpt = s"$w/ckpt"
    new java.io.File(src).mkdirs()
    Seq((1L, 10L), (2L, 20L), (1L, 5L)).toDF("k", "v")
      .write.parquet(s"$src/b0")
    def drain(): Unit = {
      val q = spark.readStream.schema("k LONG, v LONG")
        .parquet(s"$src/*")
        .groupBy("k").agg(sum("v").as("total"))
        .writeStream.format("graft").outputMode("update")
        .option("mergeKeys", "k").option("statCols", "k")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dest)
      q.awaitTermination()
    }
    drain()
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 15L), (2L, 20L)))
    val v1 = VersionedTable.versions(spark, dest)
    // restart with nothing new: no extra commit
    drain()
    assert(VersionedTable.versions(spark, dest) == v1,
      "an empty restart must not commit")
    // new data touches k=2 and introduces k=3: Update emits ONLY those
    // two keys and the sink upserts them — k=1's row survives untouched
    Seq((2L, 1L), (3L, 30L)).toDF("k", "v").write.parquet(s"$src/b1")
    drain()
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 15L), (2L, 21L), (3L, 30L)))
  }

  test("Update mode: a replayed micro-batch upserts exactly once") {
    val w = fresh("gskur"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "update-replay-spec",
      append = false, Seq.empty, Map("statCols" -> "k"),
      mergeKey = Some("k"))
    sink.addBatch(0L, Seq((1L, 10L), (2L, 20L)).toDF("k", "total"))
    sink.addBatch(1L, Seq((2L, 25L), (3L, 30L)).toDF("k", "total"))
    assert(VersionedTable.versions(spark, dest) == Seq(1, 2))
    // crash-replay of batch 1 (different content must be IGNORED —
    // the txn guard decides by (appId, batchId), not by payload)
    sink.addBatch(1L, Seq((2L, 999L)).toDF("k", "total"))
    assert(VersionedTable.versions(spark, dest) == Seq(1, 2),
      "a replayed batch must be a metadata-checked no-op")
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 25L), (3L, 30L)))
  }

  test("Update mode: key stats default on (bootstrap stamps them)") {
    val w = fresh("gskus"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "update-stats-spec",
      append = false, Seq.empty, Map.empty, mergeKey = Some("k"))
    sink.addBatch(0L, (1L to 100L).map(k => (k, k)).toDF("k", "total"))
    // bootstrap stamped key stats without the caller asking — the
    // no-per-batch-scan pin lives in UpdateSinkScaleSpec (notifier
    // access is package-private to graft.sources)
    assert(VersionedTable.statsCovered(
      VersionedTable.manifest(spark, dest, 1), Seq("k")),
      "Update mode must default statCols to the merge key")
    sink.addBatch(1L, Seq((5L, 55L)).toDF("k", "total"))
    assert(VersionedTable.read(spark, dest)
      .filter(col("k") === 5L).select("total").as[Long].head() == 55L)
  }

  test("Update mode deleteColumn: flagged keys mirror CDC deletes") {
    val w = fresh("gskud"); val dest = s"$w/dest"
    val sink = new GraftStreamSink(dest, appId = "update-del-spec",
      append = false, Seq.empty, Map("deleteColumn" -> "del"),
      mergeKey = Some("k"))
    sink.addBatch(0L,
      Seq((1L, 10L, false), (2L, 20L, false), (3L, 30L, false))
        .toDF("k", "total", "del"))
    sink.addBatch(1L,
      Seq((2L, 25L, false), (3L, 0L, true), (4L, 40L, false))
        .toDF("k", "total", "del"))
    assert(VersionedTable.read(spark, dest).select("k", "total")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 25L), (4L, 40L)),
      "flagged key 3 must be deleted, 2 updated, 4 inserted")
    assert(!VersionedTable.read(spark, dest).columns.contains("del"),
      "the flag column itself is not stored")
  }

  test("Update mode without mergeKeys fails loudly at sink creation") {
    import org.apache.spark.sql.streaming.OutputMode
    val e = intercept[IllegalArgumentException] {
      new GraftStreamSinkProvider().createSink(spark.sqlContext,
        Map("path" -> s"${fresh("gskx")}/t"), Seq.empty,
        OutputMode.Update())
    }
    assert(e.getMessage.contains("mergeKeys"), e.getMessage)
  }

  test("distinct checkpoint paths never alias to one txn identity") {
    import org.apache.spark.sql.streaming.OutputMode
    // 128-bit path hash: two different checkpoints => two appIds, so
    // two queries appending to the SAME table cannot swallow each
    // other's batches through the replay guard
    val w = fresh("gska"); val dest = s"$w/dest"
    def sinkFor(ckpt: String): GraftStreamSink =
      new GraftStreamSinkProvider().createSink(spark.sqlContext,
        Map("path" -> dest, "checkpointLocation" -> ckpt),
        Seq.empty, OutputMode.Append()).asInstanceOf[GraftStreamSink]
    sinkFor(s"$w/ckpt1").addBatch(0L, Seq((1L, 1L)).toDF("k", "v"))
    // the second QUERY starts at batchId 0 too — with a shared appId
    // the guard would drop this batch as a replay
    sinkFor(s"$w/ckpt2").addBatch(0L, Seq((2L, 2L)).toDF("k", "v"))
    assert(VersionedTable.read(spark, dest).as[(Long, Long)]
      .collect().toSet == Set((1L, 1L), (2L, 2L)),
      "distinct queries' batches must both land")
  }
}
