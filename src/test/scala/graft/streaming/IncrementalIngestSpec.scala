package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalIngestSpec extends SparkSpec {

  private def work() = java.nio.file.Files
    .createTempDirectory("incr_spec").toAbsolutePath.toString

  private val docs = graft.Tables.load(spark, sfDir, "documents")

  private def drain(w: String): Unit =
    IncrementalIngest.drainToParquet(spark, s"$w/src", docs.schema,
      s"$w/out", s"$w/ckpt")(df =>
      df.select(col("doc_id"), col("n_chars")))

  test("two staged drains produce each row exactly once") {
    val w = work()
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val afterFirst = spark.read.parquet(s"$w/out").count()
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val out = spark.read.parquet(s"$w/out")
    assert(afterFirst == docs.filter(col("doc_id") % 2 === 0).count())
    assert(out.count() == docs.count())
    assert(out.groupBy("doc_id").count().filter(col("count") > 1)
      .count() == 0, "no row may be ingested twice")
  }

  test("re-draining with nothing new is a no-op") {
    val w = work()
    docs.coalesce(1).write.mode("append").parquet(s"$w/src")
    drain(w)
    val n1 = spark.read.parquet(s"$w/out").count()
    drain(w) // same checkpoint, no new files
    assert(spark.read.parquet(s"$w/out").count() == n1)
  }

  test("versioned-table ingest: one commit per batch, snapshots per arrival") {
    val w = work()
    val table = s"$w/table"
    def drainVt(): Unit = IncrementalIngest.drainToVersionedTable(
      spark, s"$w/src", docs.schema, table, s"$w/ckpt")(
      _.select(org.apache.spark.sql.functions.col("doc_id")))
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drainVt()
    val evens = docs.filter(col("doc_id") % 2 === 0).count()
    assert(graft.sources.VersionedTable.read(spark, table).count() == evens)
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drainVt()
    assert(graft.sources.VersionedTable.versions(spark, table) == Seq(1, 2))
    // time travel: v1 is exactly the first arrival
    assert(graft.sources.VersionedTable.read(spark, table, Some(1))
      .count() == evens)
    assert(graft.sources.VersionedTable.read(spark, table)
      .count() == docs.count())
  }

  test("versioned-table ingest: a replayed batch is skipped by its marker") {
    val w = work()
    val table = s"$w/table"
    // simulate the post-crash replay: the batch's marker was published
    // but the checkpoint never advanced — the re-run sees batch 0 again
    val marker = new java.io.File(s"$table/_batches/b0")
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    IncrementalIngest.drainToVersionedTable(
      spark, s"$w/src", docs.schema, table, s"$w/ckpt")(
      _.select(org.apache.spark.sql.functions.col("doc_id")))
    // the marked batch must NOT have committed
    assert(graft.sources.VersionedTable.versions(spark, table).isEmpty)
    // the next batch (new files, new id) commits normally
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    IncrementalIngest.drainToVersionedTable(
      spark, s"$w/src", docs.schema, table, s"$w/ckpt")(
      _.select(org.apache.spark.sql.functions.col("doc_id")))
    assert(graft.sources.VersionedTable.read(spark, table).count() ==
      docs.filter(col("doc_id") % 2 === 1).count())
  }

  test("partitioned versioned-table ingest: tagged commits, pruned reads, replay-safe") {
    val w = work()
    val table = s"$w/table"
    val VT = graft.sources.VersionedTable
    def drainVt(): Unit =
      IncrementalIngest.drainToVersionedTablePartitioned(
        spark, s"$w/src", docs.schema, table, s"$w/ckpt",
        partitionBy = Some("source"))(
        _.select(col("doc_id"), col("source")))
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drainVt()
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$w/src")
    drainVt()
    drainVt() // nothing new: no extra commit
    assert(VT.versions(spark, table) == Seq(1, 2))
    val m = VT.manifest(spark, table, 2)
    // every streamed file is tagged; both arrivals contribute a file
    // per source present in them
    assert(VT.partitionsOf(m).size == VT.dataFilesOf(m).size)
    val oneSrc = docs.select("source").distinct()
      .orderBy("source").limit(1).collect()(0).getString(0)
    val pruned = VT.readPartitions(spark, table, "source", Seq(oneSrc))
    assert(pruned.count() ==
      docs.filter(col("source") === oneSrc).count())
    assert(VT.partitionCandidates(m, "source", Seq(oneSrc)).size ==
      VT.partitionsOf(m).count(_._2 == oneSrc))
    assert(VT.partitionCandidates(m, "source", Seq(oneSrc)).size <
      VT.dataFilesOf(m).size)
  }
}
