package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"))
    .toDF("id", "v", "part")

  test("ParquetSink round-trips, partitioned layout prunes by directory") {
    val dir = Files.createTempDirectory("graft_sink_p").toString
    ParquetSink(dir, "t", partitionBy = Seq("part")).write(data)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 3)
    // partition pruning visible in the scan: only one directory read
    val pruned = back.filter($"part" === "y")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(600))
  }

  test("PartitionBackfillSink rewrites only the partitions in the frame") {
    val dir = Files.createTempDirectory("graft_backfill").toString
    ParquetSink(dir, "t", partitionBy = Seq("part")).write(data)
    // backfill partition x with corrected rows; y must be untouched
    val fixed = Seq((1L, "a2", "x"), (2L, "b2", "x")).toDF("id", "v", "part")
    PartitionBackfillSink(dir, "t", Seq("part")).write(fixed)
    val back = spark.read.parquet(s"$dir/t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set((1L, "a2", "x"), (2L, "b2", "x"), (3L, "c", "y")))
  }

  test("compactParquet collapses a many-file table without changing rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(0, 10000).toDF("id").repartition(20).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 20)
    val written = graft.operators.ScaleOps.compactParquet(spark, dir)
    assert(written < 20 && files() == written)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("FormatSink round-trips orc and json with identical rows") {
    for (fmt <- Seq("orc", "json")) {
      val dir = Files.createTempDirectory(s"graft_sink_$fmt").toString
      FormatSink(dir, "t", fmt).write(data)
      val back = spark.read.format(fmt)
        .schema(data.schema).load(s"$dir/t")
        .select($"id", $"v", $"part")
      assert(back.collect().map(_.toSeq).toSet ==
        data.collect().map(_.toSeq).toSet, fmt)
    }
  }

  test("JdbcSink overwrite is idempotent against a live database") {
    val url = "jdbc:derby:memory:graftsinkspec;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val sink = JdbcSink(url, "t_sink", driver,
      createTableColumnTypes = Some("part VARCHAR(10)"))
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t_sink")
      .option("driver", driver).load()
      .toDF("id", "v", "part")
    sink.write(data)
    sink.write(data) // overwrite must replace, not append
    assert(readBack().collect().map(_.toSeq).toSet ==
      data.collect().map(_.toSeq).toSet)
  }

  test("JdbcUpsertSink: newer-guard MERGE converges under out-of-order batches") {
    val url = "jdbc:derby:memory:graftupsertspec;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val sink = JdbcUpsertSink(url, "t_up", driver,
      keyCols = Seq("k"), orderCols = Seq("ts", "sid"),
      createTableColumnTypes = Some("v VARCHAR(10)"))
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t_up")
      .option("driver", driver).load()
      .toDF("k", "ts", "sid", "v")
      .collect().map(_.toSeq).toSet
    // batch 1: the NEWER rows arrive first
    sink.write(Seq((1L, 20L, 1L, "new"), (2L, 10L, 1L, "b"))
      .toDF("k", "ts", "sid", "v"))
    // batch 2: older row for key 1 (must NOT clobber), newer for key 2,
    // tie-on-ts for key 2 resolved by sid, and a fresh key 3
    sink.write(Seq((1L, 5L, 9L, "old"), (2L, 10L, 2L, "b2"),
        (3L, 1L, 1L, "c")).toDF("k", "ts", "sid", "v"))
    assert(readBack() == Set(
      Seq(1L, 20L, 1L, "new"), Seq(2L, 10L, 2L, "b2"), Seq(3L, 1L, 1L, "c")))
    // replay of batch 2 is a no-op (idempotent)
    sink.write(Seq((1L, 5L, 9L, "old"), (2L, 10L, 2L, "b2"),
        (3L, 1L, 1L, "c")).toDF("k", "ts", "sid", "v"))
    assert(readBack() == Set(
      Seq(1L, 20L, 1L, "new"), Seq(2L, 10L, 2L, "b2"), Seq(3L, 1L, 1L, "c")))
  }
}
