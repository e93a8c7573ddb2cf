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
}
