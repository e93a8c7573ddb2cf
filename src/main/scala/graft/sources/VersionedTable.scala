package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned-table layer over parquet — manifest-based
  * commits with time travel, the core mechanism of the table formats
  * (Delta/Iceberg txn logs) expressed in ~100 lines so the engine's
  * maintenance operators ([[Compaction]], [[FileSkipping]]) have a
  * snapshot story to compose with.
  *
  * Layout:
  * {{{
  *   table/
  *     data/<commit>-<uuid>/part-*.parquet   (immutable once committed)
  *     _manifests/v00000001.json             (file list of version 1)
  *     _manifests/v00000002.json             ...
  * }}}
  *
  * The COMMIT is the manifest rename: data files are written first
  * (invisible to readers — nothing references them), then the manifest
  * is published via write-to-temp + atomic rename. A reader resolves
  * the latest version by listing `_manifests` and loads exactly the
  * files that manifest names — so readers never see a half-written
  * commit, appends never rewrite existing data files, and any old
  * version stays readable until [[vacuum]] retires it. Version numbers
  * are dense integers; on a filesystem with atomic rename two racing
  * writers cannot both publish the same version (the second rename
  * fails) — the loser retries with the next number.
  *
  * This is deliberately the local/HDFS realization (atomic rename);
  * on an object store the publish step becomes a conditional PUT, and
  * everything else is unchanged.
  */
object VersionedTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")

  private def manifestPath(table: String, v: Int) =
    new Path(manifestDir(table), f"v$v%08d.json")

  /** Dense, sorted list of committed versions. */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.substring(1, n.length - 5).toInt }
      .sorted
  }

  /** The exact file list version `v` reads — the table-format
    * DESCRIBE DETAIL surface, and how specs assert file-level
    * copy-on-write (carried files appear verbatim across versions). */
  def manifest(spark: SparkSession, table: String, v: Int): Seq[String] =
    readManifest(spark, table, v)

  private def readManifest(spark: SparkSession, table: String,
                           v: Int): Seq[String] = {
    val p = manifestPath(table, v)
    val in = fs(spark, p).open(p)
    val raw = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
    // manifest body: one file path per line (JSON-free on purpose:
    // no parser dependency, diff-friendly, trivially streamable)
    raw.linesIterator.filter(_.nonEmpty).toSeq
  }

  private[sources] def writeManifest(spark: SparkSession, table: String, v: Int,
                                     files: Seq[String]): Unit = {
    val target = manifestPath(table, v)
    val f = fs(spark, target)
    f.mkdirs(manifestDir(table))
    val tmp = new Path(manifestDir(table), s".tmp-v$v-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // the COMMIT: atomic publish; fails if the version already exists
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      sys.error(s"version $v already committed (concurrent writer) — retry")
    }
  }

  /** Commit `df` as the next version. `append = true` carries the
    * previous version's files forward (delta commit: only new rows are
    * written); `append = false` is a logical overwrite (old files stay
    * on disk for time travel until vacuumed). Returns the committed
    * version number. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             append: Boolean): Int = {
    val next = versions(spark, table).lastOption.getOrElse(0) + 1
    val dataDir = new Path(table,
      s"data/$next-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val carried =
      if (append && next > 1) readManifest(spark, table, next - 1)
      else Seq.empty
    writeManifest(spark, table, next, carried ++ newFiles)
    next
  }

  /** Snapshot read: the named version, or the latest. Empty table →
    * error (there is no schema to synthesize). */
  def read(spark: SparkSession, table: String,
           version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed versions in $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(readManifest(spark, table, v): _*)
  }

  /** MERGE INTO with FILE-LEVEL copy-on-write — the composition the
    * table layer exists for: instead of rewriting the whole table
    * (naive overwrite) or the matched rows in place (impossible on
    * immutable parquet), only the files whose key `[min, max]` can
    * contain a source key are rewritten; every other file is carried
    * into the new manifest untouched. On a key-clustered 100 TB table
    * a point-ish merge rewrites a handful of files.
    *
    * Semantics per source row: key exists → row is REPLACED; key new →
    * row is INSERTED; `deleteCol` true → key is DELETED (the flag
    * column itself is not stored). `source` must have one row per key.
    *
    * The touched-file set comes from a distributed stats⋈source range
    * join (never a driver-side key list); stats for the key column are
    * collected from the current snapshot with a column-pruned scan —
    * maintain them incrementally via [[FileSkipping.updateStats]] at
    * commit time to make this O(new files) instead. Returns the new
    * version. */
  def mergeCommit(spark: SparkSession, table: String, source: DataFrame,
                  keyCol: String, deleteCol: Option[String] = None): Int = {
    import org.apache.spark.sql.functions._
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed versions in $table")
    val current = readManifest(spark, table, vs.last)
    val stats = FileSkipping.collectStatsFiles(spark, current, Seq(keyCol))
    // source keys x BROADCAST stats: each source partition probes the
    // O(files) stats list locally — distributed in the big dimension
    // (keys), never a driver-side key set. (At very large file counts
    // swap in RangeJoin.pointInInterval for a bucketed equi-join.)
    val touched = source.select(col(keyCol).as("__mk"))
      .join(broadcast(stats),
        col(s"${keyCol}_min") <= col("__mk") &&
          col(s"${keyCol}_max") >= col("__mk"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    // normalize: manifest paths vs input_file_name URIs
    def norm(s: String) = new Path(s).toUri.getPath
    val touchedNorm = touched.map(norm)
    val (rewrite, carry) = current.partition(f => touchedNorm.contains(norm(f)))
    val upserts = deleteCol.fold(source)(d =>
      source.filter(!col(d)).drop(d))
    val survivors =
      if (rewrite.isEmpty) upserts
      else spark.read.parquet(rewrite: _*)
        .join(source.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(upserts)
    val next = vs.last + 1
    val dataDir = new Path(table,
      s"data/$next-${java.util.UUID.randomUUID().toString.take(8)}")
    survivors.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    writeManifest(spark, table, next, carry ++ newFiles)
    next
  }

  /** Retire versions older than `keepLast`: their manifests are
    * removed and any data file no surviving manifest references is
    * deleted. Time travel to retired versions is gone; surviving
    * versions are untouched. */
  def vacuum(spark: SparkSession, table: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the latest version")
    val vs = versions(spark, table)
    val (retire, keep) = vs.splitAt(math.max(vs.size - keepLast, 0))
    if (retire.isEmpty) return
    val live = keep.flatMap(v => readManifest(spark, table, v)).toSet
    val dead = retire.flatMap(v => readManifest(spark, table, v))
      .filterNot(live.contains).distinct
    val f = fs(spark, new Path(table))
    dead.foreach(p => f.delete(new Path(p), false))
    retire.foreach(v => f.delete(manifestPath(table, v), false))
    // sweep commit dirs the deletions emptied (cosmetic, keeps `data/`
    // listings proportional to live versions)
    val dataRoot = new Path(table, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { d =>
      if (d.isDirectory &&
        !f.listStatus(d.getPath).exists(_.getPath.getName.endsWith(".parquet")))
        f.delete(d.getPath, true)
    }
  }
}
