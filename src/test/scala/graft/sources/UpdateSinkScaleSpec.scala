package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The Update-mode sink's 100 TB contract: because the bootstrap
  * stamps merge-key stats by default, every later micro-batch's
  * touched-file probe decides from manifest st ranges — ZERO stats
  * scans per batch (the difference between O(changed files) and
  * O(table) per batch). Driven through the public provider; the
  * notifier pin needs this package. */
class UpdateSinkScaleSpec extends SparkSpec {
  import spark.implicits._

  test("no per-batch stats scan: the upsert probe is metadata-only") {
    val dest = Files.createTempDirectory("gsk_scale").toString + "/t"
    val sink = new graft.streaming.GraftStreamSinkProvider()
      .createSink(spark.sqlContext,
        Map("path" -> dest, "txnAppId" -> "upd-scale-spec",
          "mergeKeys" -> "k"),
        Seq.empty, OutputMode.Update())
    sink.addBatch(0L, (1L to 400L).map(k => (k, k)).toDF("k", "total")
      .repartitionByRange(4, col("k")))
    var scans = List.empty[(String, Int)]
    VersionedTable.statsScanNotifier = (op, n) => scans ::= (op, n)
    try sink.addBatch(1L, Seq((7L, 77L)).toDF("k", "total"))
    finally VersionedTable.statsScanNotifier = (_, _) => ()
    assert(!scans.exists(_._1 == "mergeCommit"),
      s"an Update-mode batch paid a stats scan: $scans")
    assert(VersionedTable.read(spark, dest)
      .filter(col("k") === 7L).select("total").as[Long].head() == 77L)
  }
}
