package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] fed straight from the manifest — the table-format
  * answer to file listing (guide §6: "table formats with manifest
  * metadata avoid directory listing altogether"). `spark.read
  * .parquet(files: _*)` re-LISTS every explicit path through
  * `InMemoryFileIndex` at DataFrame creation: one getFileStatus RPC
  * per file, and past `spark.sql.sources.parallelPartitionDiscovery
  * .threshold` (32) a whole Spark JOB just to stat paths the manifest
  * already describes. This index serves the scan from pre-known
  * `FileStatus` entries — zero listing RPCs, zero listing jobs, at
  * any file count.
  *
  * File lengths come from the manifest's `fz` lines; files the caller
  * has no size for are stat-ed once, in parallel, on the driver pool.
  * Modification times are irrelevant to a parquet scan (splits are
  * length-based, `_metadata.row_index` is reader-computed) and are
  * recorded as 0. */
private[sources] final class GraftFileIndex(
    spark: SparkSession,
    statuses: Seq[FileStatus]) extends FileIndex {

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))

  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}

private[sources] object GraftFileIndex {

  /** A parquet DataFrame over `files` with the EXPLICIT physical
    * schema, planned from manifest metadata: sizes from `knownSizes`
    * (the fz lines), missing ones stat-ed in parallel on the driver
    * pool. Row-identical to `spark.read.schema(phys).parquet(files)`
    * — same relation shape (LogicalRelation over HadoopFsRelation /
    * ParquetFileFormat, metadata columns included), minus the
    * listing. */
  def parquetFrame(spark: SparkSession, files: Seq[String],
                   phys: StructType,
                   knownSizes: String => Option[Long]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val statuses = DriverPool.mapParallel(files) { f =>
      val p = new Path(f)
      knownSizes(f) match {
        case Some(len) =>
          new FileStatus(len, false, 1, 134217728L, 0L, p)
        case None => p.getFileSystem(conf).getFileStatus(p)
      }
    }
    val relation = HadoopFsRelation(
      location = new GraftFileIndex(spark, statuses),
      partitionSchema = StructType(Nil),
      dataSchema = phys,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
