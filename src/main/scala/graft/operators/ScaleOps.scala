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
    // streams: partitioning is the source/shuffle's concern and .rdd
    // would throw; map-side kernels downstream are still parallel per
    // microbatch
    if (df.isStreaming) df
    else if (df.rdd.getNumPartitions >= min) df
    else df.repartition(min)

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

  /** Global running (prefix) sum over a total order WITHOUT a
    * single-partition window — [[globalRank]]'s shape generalized from
    * counts to sums: range-partition on the sort key, one local pass
    * per partition, then a driver-side scan of ONE partial sum per
    * partition broadcast back as offsets. Driver state is O(partitions)
    * longs; the global sort-and-sum a naive
    * `Window.orderBy(...)` would serialize through one task instead
    * runs fully parallel. The primitive behind interval sweeps
    * (concurrency counting), cumulative distributions, and exclusive
    * bin-packing offsets at 100 TB.
    *
    * Block-store hygiene: nothing is persisted. The offsets job and
    * the caller's action share the range-exchange's ShuffleMapStage
    * (same memoized `Dataset.rdd`), so the second job re-reads the
    * shuffle files (skipped map stage) and only re-runs the cheap
    * in-partition sort — cheaper than parking the whole sorted frame
    * in executor memory across gate runs. Callers that iterate the
    * result many times can `.cache()` the RETURNED frame themselves
    * and own its unpersist. */
  def globalRunningSum(df: DataFrame,
                       sortCols: Seq[org.apache.spark.sql.Column],
                       valueCol: String,
                       sumName: String = "running_sum",
                       partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val valueIdx = df.schema.fieldIndex(valueCol)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val sums = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var s = 0L; while (it.hasNext) { s += it.next().getLong(valueIdx) }; s
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(sums.scanLeft(0L)(_ + _))
    val schema = sorted.schema
      .add(sumName, org.apache.spark.sql.types.LongType, nullable = false)
    val summed = sorted.rdd.mapPartitionsWithIndex({ (i, it) =>
      var s = offsets.value(i)
      it.map { row =>
        s += row.getLong(valueIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ s)
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(summed, schema)
  }

  /** Global dense 1-based rank over a total order WITHOUT the
    * single-partition window that `row_number() OVER (ORDER BY ...)`
    * plans (Spark moves the whole table to ONE task when the window
    * has no PARTITION BY — the canonical driver-shaped scale killer).
    *
    * Two-pass range-partitioned form instead: range-shuffle + local
    * sort (exactly a global sort's plan), count each partition (a
    * #partitions-sized driver array — bounded by cluster width, not
    * data), then add per-partition offsets in a narrow map. The rank
    * values depend only on the total order, not on where the range
    * boundaries land, so the result is deterministic even though
    * RangePartitioner samples. `sortCols` must be a total order (tie
    * rows would get an arbitrary-but-deterministic order; give a
    * unique tiebreak column for cross-engine stability).
    *
    * Block-store hygiene: nothing is persisted — the two jobs share
    * the range-exchange's shuffle files (see [[globalRunningSum]]);
    * only the in-partition sort re-runs on the caller's action. */
  def globalRank(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                 rankName: String = "rank",
                 partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val sizes = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(sizes.scanLeft(0L)(_ + _))
    val schema = sorted.schema
      .add(rankName, org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = sorted.rdd.mapPartitionsWithIndex({ (i, it) =>
      var r = offsets.value(i)
      it.map { row =>
        r += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(ranked, schema)
  }

  /** 2-D Z-order (Morton) key: interleaves the low 16 bits of `x` and
    * `y` (x in even bit positions). Pure built-in bit arithmetic — 32
    * shift/mask terms OR-folded, fully inside whole-stage codegen.
    *
    * Use with [[zorderLayout]]: rows close in BOTH dimensions land in
    * the same files, so parquet row-group min/max statistics prune
    * 2-D range predicates — the multi-dimensional generalization of
    * sort-by-one-column layout, and the standard answer to "cluster a
    * 100 TB fact table by (customer, date) at once". Callers map each
    * dimension into [0, 65535] first (rank, epoch-day, bucket id...);
    * out-of-range bits are masked off. */
  def zorderKey2(x: org.apache.spark.sql.Column,
                 y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xi = x.cast("bigint").bitwiseAND(lit(0xFFFFL))
    val yi = y.cast("bigint").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order-clustered layout: range-partition and sort by the Morton
    * key, ready to write. One shuffle at write time buys min/max
    * pruning on both dimensions for every subsequent read. */
  def zorderLayout(df: DataFrame, x: org.apache.spark.sql.Column,
                   y: org.apache.spark.sql.Column,
                   partitions: Int): DataFrame =
    df.withColumn("__z", zorderKey2(x, y))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** N-dimensional Z-order (Morton) key — [[zorderKey2]] generalized:
    * interleaves the low `63 / n` bits of each dimension (dimension j
    * occupies bit positions `n*i + j`), so up to 8 dimensions share
    * one 63-bit key. Same contract: callers pre-map each dimension
    * into its rank/bucket range; out-of-range bits are masked off.
    * Still pure built-in bit arithmetic inside whole-stage codegen —
    * the bits-per-dimension tradeoff (16 at n=2..3, 15 at n=4, 9 at
    * n=7) is the standard Z-order resolution/width balance: more
    * clustered dimensions, coarser cells each. */
  def zorderKeyN(dims: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    val n = dims.size
    require(n >= 2 && n <= 8, s"zorderKeyN wants 2..8 dimensions, got $n")
    val bits = 63 / n
    dims.zipWithIndex.map { case (c, j) =>
      val ci = c.cast("bigint").bitwiseAND(lit((1L << bits) - 1L))
      (0 until bits).map { i =>
        shiftleft(shiftright(ci, i).bitwiseAND(lit(1L)), n * i + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** [[zorderLayout]] over N dimensions: one write-time range shuffle
    * + in-partition sort on the N-dim Morton key buys min/max pruning
    * on EVERY clustered dimension for all later reads. */
  def zorderLayoutN(df: DataFrame,
                    dims: Seq[org.apache.spark.sql.Column],
                    partitions: Int): DataFrame =
    df.withColumn("__z", zorderKeyN(dims))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** LEX-RANK boundaries for an arbitrary orderable column: `buckets-1`
    * evenly spaced DISTINCT values (one distinct+sort job, O(buckets)
    * driver state — the same information a RangePartitioner samples,
    * computed exactly). [[rankBucketExpr]] turns them into a per-row
    * bucket id, which is what lets a STRING dimension join a Z-order
    * key: `zorderKeyN` needs small integers, and a raw string casts to
    * NULL — hashing would preserve nothing, but the lex rank keeps
    * range locality, so post-clustering string [min,max] stats prune
    * string ranges exactly like numeric ones. */
  def rankBoundaries(df: DataFrame, c: org.apache.spark.sql.Column,
                     buckets: Int): Seq[String] = {
    require(buckets >= 2, "need at least 2 buckets")
    val d = df.select(c.cast("string").as("__v")).na.drop()
      .distinct().orderBy(col("__v"))
    val n = d.count()
    if (n <= 1) return Seq.empty
    val step = math.max(1L, n / buckets)
    d.rdd.zipWithIndex()
      .collect { case (r, i) if i % step == 0 && i > 0 => r.getString(0) }
      .collect().toSeq.take(buckets - 1)
  }

  /** `# boundaries <= value` — the bucket id of `c` under
    * [[rankBoundaries]], as ONE codegen-friendly expression (array
    * literal + aggregate; no join, no window). NULLs land in bucket
    * 0 with the smallest values. */
  def rankBucketExpr(c: org.apache.spark.sql.Column,
                     boundaries: Seq[String])
      : org.apache.spark.sql.Column =
    if (boundaries.isEmpty) lit(0L)
    else aggregate(
      lit(boundaries.toArray),
      lit(0L),
      (acc, b) => acc + when(c.cast("string") >= b, 1L).otherwise(0L))
}
