package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance half of a parquet table's
  * lifecycle. Streaming ingest, incremental upserts, and fine-grained
  * partitioning all fragment a dataset into files far below the
  * scan-efficient size; at 100 TB the resulting per-file open/footer
  * overhead (and driver-side listing cost) dominates selective reads
  * long before data volume does.
  *
  * `compact` rewrites the dataset into ceil(rows / targetRowsPerFile)
  * files with the write-ahead / swap-late discipline of
  * [[graft.etl.Incremental]]: the compacted copy lands in a staging
  * dir first, the old tree is kept as `<path>__precompact` until the
  * swap completes, and a crash at any point leaves either the old or
  * the new tree intact — never a half-written table. (On an
  * object store you would commit via the table format's transaction
  * log instead of renames; the staging discipline is the same.)
  *
  * Scope: FLAT datasets (one directory of part files) — the layout
  * every operator here writes. A hive-partitioned tree needs per-
  * partition compaction (apply this per leaf directory); the file
  * listing is deliberately non-recursive so a partitioned root fails
  * loudly (zero files) instead of silently flattening the partitions.
  *
  * Content is preserved as a multiset — compaction never reorders
  * semantics, only file boundaries. Combine with
  * [[graft.operators.ScaleOps.zorderLayout]] before the write when the
  * compaction pass should also fix clustering for
  * [[FileSkipping]]-style pruning.
  */
object Compaction {

  case class Report(filesBefore: Long, filesAfter: Long, rows: Long)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        p: Path): Seq[Path] =
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet"))

  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long): Report = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, p).size.toLong
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L,
      (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val staging = new Path(path + "__staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    df.repartition(nFiles).write.parquet(staging.toString)
    val backup = new Path(path + "__precompact")
    if (fs.exists(backup)) fs.delete(backup, true)
    require(fs.rename(p, backup), s"cannot retire $p")
    if (!fs.rename(staging, p)) {
      // restore the original tree before failing: never leave the
      // table missing
      fs.rename(backup, p)
      sys.error(s"cannot publish $staging")
    }
    fs.delete(backup, true)
    Report(before, dataFiles(fs, p).size.toLong, rows)
  }
}
