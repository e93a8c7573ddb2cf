package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the batch-watermark ingest
  * pattern (reference S3/S4: "consume new data without repeating
  * previous executions") extended to the AGGREGATE side: instead of
  * recomputing a rollup over all history per run, fold each new delta
  * into a persisted mergeable state.
  *
  * Only re-aggregable measures are maintained (count + sums; min/max
  * merge the same way): merge(state, delta) = groupBy(keys).sum — so a
  * run costs O(delta + |state|), never O(history). At 100 TB of
  * history this is the difference between a nightly job that reads one
  * day and one that reads three years. Averages derive as sum/count at
  * read time; non-mergeable measures (exact distinct, exact quantiles)
  * need their own sketch or a full recompute.
  *
  * State layout: `stateDir/current` (parquet) with `stateDir/prev`
  * kept as the rollback copy; the swap is two renames after the new
  * version is fully materialized, so a crash leaves a consistent
  * `current` (write-ahead, swap-late).
  */
object Incremental {

  /** Pure merge: fold a delta into an optional previous state. Both
    * state and result have schema (keys..., cnt, sumCols...). */
  def mergeCountsSums(prev: Option[DataFrame], delta: DataFrame,
                      keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val partial = delta.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
    prev.fold(partial) { p =>
      p.unionByName(partial)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sumCols.map(c => sum(col(c)).as(c)): _*)
    }
  }

  /** Fold `delta` into the persisted state under `stateDir` and return
    * the new state frame. A crash between the two swap renames leaves
    * no `current`; the next run detects that and restores the rollback
    * copy before proceeding, so accumulated state is never silently
    * dropped. */
  def updateState(spark: SparkSession, stateDir: String, delta: DataFrame,
                  keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(stateDir, "current")
    val prevDir = new Path(stateDir, "prev")
    // crash recovery: died after current->prev but before staging->current
    if (!fs.exists(current) && fs.exists(prevDir)) {
      require(fs.rename(prevDir, current),
        s"state recovery failed: cannot restore $prevDir to $current")
    }
    val previous =
      if (fs.exists(current)) Some(spark.read.parquet(current.toString))
      else None
    val merged = mergeCountsSums(previous, delta, keyCols, sumCols)
    val staging = new Path(stateDir, "staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    // materializes the merge (and with it the read of `current`) BEFORE
    // any rename touches `current`
    merged.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(prevDir)) fs.delete(prevDir, true)
    if (fs.exists(current)) {
      require(fs.rename(current, prevDir), s"cannot archive $current")
    }
    require(fs.rename(staging, current), s"cannot publish $staging")
    spark.read.parquet(current.toString)
  }
}
