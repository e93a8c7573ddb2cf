package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-skipping by per-file column statistics — the Delta/Iceberg
  * file-pruning pattern, expressed over plain parquet: a stats table
  * holding min/max/null-count per file per indexed column lets a range
  * query enumerate the files that can possibly match BEFORE the scan,
  * so a selective predicate reads a handful of files out of a 100 TB
  * dataset instead of all of them. Spark's parquet reader already
  * prunes row groups inside each file it opens; file-level skipping
  * removes the open-and-footer-read per irrelevant file entirely,
  * which at object-store latencies is the dominant cost of a selective
  * scan over many files.
  *
  * Effectiveness depends on LAYOUT: stats prune by [min, max]
  * intersection, so files must be value-clustered on the indexed
  * column — `repartitionByRange` (or z-order for multi-column
  * predicates, [[graft.operators.ScaleOps.zorderKey2]]) before the
  * write. On a randomly laid-out dataset every file straddles the full
  * value range and nothing prunes (that degenerate case still returns
  * correct results — pruning is an optimization, never a filter).
  *
  * At scale the stats table is maintained INCREMENTALLY at commit time
  * (stats for new files only, like a transaction log); [[collectStats]]
  * computes it in one scan for an existing dataset. It is O(files) rows
  * — small enough to broadcast or keep on the driver.
  */
object FileSkipping {

  /** One scan → per-file stats for `cols`: n_rows plus min/max/
    * null-count per column. Grouping by `input_file_name()` keeps the
    * aggregation map-side-heavy: each task sees few distinct files. */
  def collectStats(spark: SparkSession, path: String,
                   cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(path), cols)

  /** [[collectStats]] over an explicit file list (a manifest's
    * snapshot view rather than a directory). */
  private[sources] def collectStatsFiles(spark: SparkSession,
                                         files: Seq[String],
                                         cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(files: _*), cols)

  /** Per-file stats read from the PARQUET FOOTERS — zero data I/O
    * (every writer already paid for these at write time). Returns
    * `file -> (nrows, col -> (minStr, maxStr, nulls))` with min/max
    * rendered EXACTLY as the scan path renders them (`Long/Int/
    * Boolean.toString`, UTF-8 decode for strings), or None when any
    * requested column in any file can't be served exactly:
    * unannotated numeric/boolean primitives and STRING-annotated
    * BINARY qualify. Strings are safe because parquet-mr footer
    * stats are untruncated (truncation applies to column indexes;
    * footer stats over [[BinaryStatsMaxBytes]] are DROPPED by the
    * writer, which lands in the stats-unset fallback below) and the
    * footer's unsigned-lexicographic byte order IS Spark's
    * UTF8String order, so the reduced min/max equals what a scan
    * aggregate produces; a defensive size guard bails to the scan
    * path anyway near the writer's drop threshold. Annotated types
    * OTHER than string (timestamp, date, decimal) render differently
    * in a scan and stay excluded, as do float/double (writers
    * normalize zero bounds to -0.0/+0.0 and omit NaN while Spark's
    * max orders NaN above +Inf). Callers fall back to the one-scan
    * path on None; correctness never rides on the footer. */
  private val BinaryStatsMaxBytes = 1024
  private[sources] def footerStats(spark: SparkSession, files: Seq[String],
                                   cols: Seq[String])
      : Option[Map[String, (Long, Map[String, (Option[String], Option[String], Long)])]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    // per-file work as a LOCAL total function (None = this file can't
    // be served exactly) so the files can fan out on the driver pool —
    // serial footer opens would put N × open-latency on the commit's
    // critical path, and a non-local `return` cannot cross threads
    def oneFile(p: String)
        : Option[(String, (Long, Map[String, (Option[String], Option[String], Long)]))] = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        val blocks = footer.getBlocks.asScala.toSeq
        val nrows = blocks.map(_.getRowCount).sum
        def oneCol(c: String)
            : Option[(String, (Option[String], Option[String], Long))] = {
          if (!schema.containsField(c)) return None
          val field = schema.getType(Seq(c): _*)
          if (!field.isPrimitive) return None
          val prim = field.asPrimitiveType()
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
          import org.apache.parquet.schema.LogicalTypeAnnotation
          val isString = prim.getPrimitiveTypeName == BINARY &&
            prim.getLogicalTypeAnnotation
              .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
          if (prim.getLogicalTypeAnnotation != null && !isString)
            return None
          prim.getPrimitiveTypeName match {
            // NOT float/double: parquet writers normalize zero
            // bounds to -0.0/+0.0 (rendering diverges from a scan's
            // min) and omit NaN from stats entirely while Spark's
            // max orders NaN above +Inf — either way the footer
            // bound would disagree with the scan the rest of the
            // table was tagged by
            case INT32 | INT64 | BOOLEAN => ()
            case BINARY if isString => ()
            case _ => return None
          }
          val chunks0 = blocks.map(_.getColumns.asScala
            .find(cc => cc.getPath.toDotString == c))
          if (chunks0.exists(_.isEmpty)) return None
          val stats = chunks0.flatten.map(_.getStatistics)
          if (stats.exists(s => s == null || s.isNumNullsSet == false))
            return None
          val nulls = stats.map(_.getNumNulls).sum
          val withVals = stats.filter(_.hasNonNullValue)
          if (withVals.isEmpty && nulls < nrows) return None // unknown
          if (withVals.isEmpty) Some(c -> (None, None, nulls)) // all-null
          else if (isString) {
            // reduce under the column's OWN comparator (unsigned
            // lexicographic for strings — identical to Spark's
            // UTF8String ordering, so the result matches a scan's
            // min()/max() byte for byte)
            val cmp = withVals.head.comparator()
              .asInstanceOf[java.util.Comparator[AnyRef]]
            val mins: Seq[AnyRef] =
              withVals.map(_.genericGetMin.asInstanceOf[AnyRef])
            val maxs: Seq[AnyRef] =
              withVals.map(_.genericGetMax.asInstanceOf[AnyRef])
            val mn = mins.reduce((a, b) => if (cmp.compare(a, b) <= 0) a else b)
              .asInstanceOf[org.apache.parquet.io.api.Binary]
            val mx = maxs.reduce((a, b) => if (cmp.compare(a, b) >= 0) a else b)
              .asInstanceOf[org.apache.parquet.io.api.Binary]
            // defensive: stay far from any writer-side stats
            // truncation/drop threshold — bail to the exact scan
            if (mn.length > BinaryStatsMaxBytes ||
                mx.length > BinaryStatsMaxBytes) return None
            Some(c -> (Some(mn.toStringUsingUTF8),
              Some(mx.toStringUsingUTF8), nulls))
          } else {
            val mins = withVals.map(_.genericGetMin.asInstanceOf[Comparable[Any]])
            val maxs = withVals.map(_.genericGetMax.asInstanceOf[Comparable[Any]])
            val mn = mins.reduce((a, b) => if (a.compareTo(b) <= 0) a else b)
            val mx = maxs.reduce((a, b) => if (a.compareTo(b) >= 0) a else b)
            Some(c -> (Some(mn.toString), Some(mx.toString), nulls))
          }
        }
        val perCol = cols.map(oneCol)
        if (perCol.exists(_.isEmpty)) None
        else Some(p -> (nrows, perCol.flatten.toMap))
      } finally reader.close()
    }
    try {
      val out = DriverPool.mapParallel(files)(oneFile)
      if (out.exists(_.isEmpty)) None else Some(out.flatten.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    df.select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Incremental maintenance — the commit-time path: scan ONLY the
    * files `stats` does not know yet (newly committed data) and union
    * their rows in. Committed files are immutable, so existing rows
    * never change; the whole update costs O(new files), not O(table).
    * Path comparison is scheme-insensitive (listing says `file:/...`,
    * `input_file_name` says `file:///...`). Flat datasets only (the
    * listing is non-recursive, like [[Compaction]]); for a
    * hive-partitioned tree run it per leaf directory. */
  def updateStats(spark: SparkSession, path: String, stats: DataFrame,
                  cols: Seq[String]): DataFrame = {
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toUri.getPath
    val known = stats.select("file").collect().map(r => norm(r.getString(0))).toSet
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet") &&
        !known.contains(norm(f.toString)))
      .map(_.toString)
    if (fresh.isEmpty) stats
    else stats.unionByName(statsOf(spark.read.parquet(fresh: _*), cols))
  }

  /** Files whose per-column [min, max] intersects EVERY requested
    * range — the only files a conjunction of `c BETWEEN lo AND hi`
    * predicates can match. NULL cells never match a range predicate,
    * so all-null files (null min/max) are skippable; files with some
    * nulls carry non-null min/max and participate normally. O(files)
    * driver work. */
  def candidateFiles(stats: DataFrame,
                     ranges: Seq[(String, Long, Long)]): Seq[String] =
    stats
      .filter(ranges.map { case (c, lo, hi) =>
        col(s"${c}_min").isNotNull &&
          col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
      }.reduce(_ && _))
      .select("file").collect().map(_.getString(0)).toSeq

  def candidateFiles(stats: DataFrame, c: String, lo: Long, hi: Long): Seq[String] =
    candidateFiles(stats, Seq((c, lo, hi)))

  /** Range read through the stats table: open ONLY the candidate
    * files, then re-apply the exact predicates (min/max intersection
    * is necessary, not sufficient). Row-identical to a full scan +
    * filter for any stats table produced by [[collectStats]] on the
    * same data. Returns an empty frame (correct schema) when no file
    * can match. Multi-column ranges are where a Z-ORDERED layout
    * ([[graft.operators.ScaleOps.zorderLayout]]) earns its keep: files
    * cluster in BOTH dimensions, so each range of the conjunction
    * prunes independently — a 1-D sorted layout can only ever prune
    * its own sort column. */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
                 ranges: Seq[(String, Long, Long)]): DataFrame = {
    val files = candidateFiles(stats, ranges)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _))
  }

  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
                 c: String, lo: Long, hi: Long): DataFrame =
    prunedRead(spark, path, stats, Seq((c, lo, hi)))

  // -------------------------------------------------------------------
  // Per-file BLOOM index — equality skipping on UNCLUSTERED columns
  // -------------------------------------------------------------------

  /** One scan → a per-file Bloom filter over `keyCol`, as rows
    * `(file, word_idx, bits)` (the relational layout of
    * [[graft.operators.Sketches.bloomBuild]], grouped by file). This
    * is the index min/max stats cannot be: on a table laid out by ship
    * date, every file straddles the full ORDER-KEY range, so a point
    * lookup on the unclustered key prunes nothing by [min, max] — but
    * each file's Bloom filter answers "could this file contain the
    * key" in O(k) bit probes with NO false negatives (the Delta/
    * Iceberg bloom-index pattern). Index size is O(files × 2^bitsLog2
    * / 8) bytes and lives beside the stats table; size `bitsLog2` so
    * bits ≳ 8 × keys-per-file to keep the false-positive rate (and
    * with it the extra files opened) in the low percent. The build is
    * map-side-heavy (each task sees few files) and shuffles only
    * O(files × words) cells. */
  def collectBloomStats(spark: SparkSession, path: String, keyCol: String,
                        bitsLog2: Int = 18, k: Int = 4): DataFrame =
    graft.operators.Sketches.bloomCells(
        spark.read.parquet(path).select(
          input_file_name().as("file"), col(keyCol)),
        col(keyCol).cast("string"), bitsLog2, k, Seq(col("file")))
      .groupBy(col("file"), col("word_idx"))
      .agg(expr("bit_or(bit)").as("bits"))

  /** The k `(word_idx, bit)` probe positions of `value` — computed
    * THROUGH the same SQL expressions the build used (one-row plan),
    * so driver and executors can never disagree on the hash. */
  private def probePositions(spark: SparkSession, value: Long,
                             bitsLog2: Int, k: Int): Seq[(Long, Long)] =
    graft.operators.Sketches.bloomCells(
        spark.range(1).select(lit(value).as("__v")),
        col("__v").cast("string"), bitsLog2, k, Nil)
      .collect().map(r => (r.getLong(r.fieldIndex("word_idx")),
        r.getLong(r.fieldIndex("bit")))).toSeq.distinct

  /** Files whose Bloom filter cannot rule out `keyCol = value`: every
    * probe bit set. Superset of the files that truly contain the key
    * (zero false negatives — each built key set exactly these bits);
    * false positives are bounded by the classic (1-e^{-kn/m})^k and
    * only cost an extra file open, never a wrong row. ONE job: the
    * probe's ≤ k words are filtered out of the index in a single pass
    * (pre-`.cache()` the index if probing often — each call otherwise
    * re-runs its build lineage), then the per-file bit checks run on
    * O(files × k) collected rows. */
  def candidateFilesBloom(spark: SparkSession, bloom: DataFrame,
                          value: Long, bitsLog2: Int = 18,
                          k: Int = 4): Seq[String] = {
    val probes = probePositions(spark, value, bitsLog2, k)
    val words = probes.map(_._1).distinct
    val rows = bloom
      .filter(col("word_idx").isin(words: _*))
      .select("file", "word_idx", "bits").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.keys.map(_._1).toSeq.distinct.sorted.filter { f =>
      probes.forall { case (w, b) =>
        (rows.getOrElse((f, w), 0L) & b) != 0L
      }
    }
  }

  /** Equality read through the Bloom index: open only the candidate
    * files, re-apply the exact predicate (membership is necessary,
    * not sufficient). Row-identical to a full scan + filter. */
  def prunedReadEquality(spark: SparkSession, path: String,
                         bloom: DataFrame, keyCol: String, value: Long,
                         bitsLog2: Int = 18, k: Int = 4): DataFrame = {
    val files = candidateFilesBloom(spark, bloom, value, bitsLog2, k)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol) === value)
  }
}
