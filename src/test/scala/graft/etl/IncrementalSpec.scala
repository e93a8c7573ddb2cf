package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def events = graft.Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))

  test("two incremental updates == one full recompute") {
    val dir = Files.createTempDirectory("graft_incr").toString
    val d1 = events.filter(col("event_id") % 2 === 0)
    val d2 = events.filter(col("event_id") % 2 === 1)
    Incremental.updateState(spark, dir, d1,
      Seq("event_type"), Seq("value_cents"))
    val after2 = Incremental.updateState(spark, dir, d2,
      Seq("event_type"), Seq("value_cents"))
      .collect().map(_.toSeq).toSet
    val full = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value_cents")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(after2 == full)
  }

  test("crash between swap renames is recovered: state restored from prev") {
    val dir = Files.createTempDirectory("graft_incr3").toString
    val keys = Seq("event_type"); val sums = Seq("value_cents")
    val d1 = events.filter(col("event_id") % 2 === 0)
    val s1 = Incremental.updateState(spark, dir, d1, keys, sums)
      .collect().map(_.toSeq).toSet
    // simulate the crash window: current archived to prev, publish never ran
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "prev"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir, "current"),
      new org.apache.hadoop.fs.Path(dir, "prev")))
    // next update must see the restored state, not start from scratch
    val after = Incremental.updateState(spark, dir,
        events.filter(col("event_id") % 2 === 1), keys, sums)
      .collect().map(_.toSeq).toSet
    val full = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value_cents")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(after == full, s"recovered state must include the first delta ($s1)")
  }

  test("state survives on disk and prev holds the pre-update rollback") {
    val dir = Files.createTempDirectory("graft_incr2").toString
    val d1 = events.filter(col("event_id") % 3 === 0)
    val s1 = Incremental.updateState(spark, dir, d1,
      Seq("event_type"), Seq("value_cents")).collect().map(_.toSeq).toSet
    Incremental.updateState(spark, dir,
      events.filter(col("event_id") % 3 === 1),
      Seq("event_type"), Seq("value_cents"))
    val reread = spark.read.parquet(s"$dir/current")
    val prev = spark.read.parquet(s"$dir/prev").collect().map(_.toSeq).toSet
    assert(prev == s1)
    assert(reread.count() > 0)
  }
}
