package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB deployment: bucketing (to
  * co-locate joins/aggregations and delete their shuffles) and salting
  * (to break up skewed keys).
  */
object ScaleOps {

  /** Write a bucketed+sorted table: joins and aggregations on the
    * bucket key against an equally-bucketed table need NO exchange —
    * the shuffle happens once at write time, then every downstream
    * consumer gets co-located, pre-sorted input (the "materialized
    * repartition" pattern for fact tables read many times). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Raise the partition count of a compute-heavy frame when the
    * source offers fewer than `min` partitions. A small parquet table
    * arrives as ONE task (file < maxPartitionBytes, one row group), so
    * every per-row kernel downstream runs serialized — measured 1.5 s
    * of single-threaded md5 shingle hashing on the sf0.1 documents
    * table. No-op when the input is already parallel: at cluster scale
    * data arrives pre-split and this never forces a shuffle. */
  def ensureParallelism(df: DataFrame, min: Int): DataFrame =
    if (df.rdd.getNumPartitions >= min) df else df.repartition(min)

  /** Salted inner equi-join for a skewed build side: the small side is
    * replicated `salts` times (one copy per salt value), the big side
    * assigns each row a deterministic pseudo-random salt, and the join
    * key becomes (key, salt) — a single hot key fans out over `salts`
    * reducers instead of melting one. Result set identical to the
    * unsalted join (replication x 1-of-salts assignment keeps exactly
    * one match per original pair). Prefer AQE's skew-join handling when
    * available; this is the explicit form for engines/configs without
    * it, or for deliberate control. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Small files are the silent scale
    * killer (a 100 TB table written by 10k tasks/day accumulates
    * millions of files -> listing, memory and scheduler pressure on
    * every read). Staged write + two renames, same crash-safe swap as
    * [[graft.etl.Incremental]]; returns the file count written. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(dir + "__compact_old")
    // crash recovery: died between the two renames of a previous run
    if (!fs.exists(path) && fs.exists(backup)) {
      require(fs.rename(backup, path),
        s"compaction recovery failed: cannot restore $backup to $path")
    }
    val bytes = fs.getContentSummary(path).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(dir + "__compact_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    spark.read.parquet(dir).repartition(parts)
      .write.parquet(staging.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    // every rename checked: the backup is deleted ONLY after the new
    // data is live (rename returning false must never cascade)
    require(fs.rename(path, backup), s"cannot archive $path")
    require(fs.rename(staging, path), s"cannot publish $staging")
    fs.delete(backup, true)
    parts
  }

  /** Two-phase (salted) aggregation: partial sums per (key, salt), then
    * final per key. Spark's hash aggregate already map-side-combines,
    * so this matters when the FINAL reducer for one giant key is the
    * bottleneck (e.g. high-cardinality partial states). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                as: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(as))
  }
}
