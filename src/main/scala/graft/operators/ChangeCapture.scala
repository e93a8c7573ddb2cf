package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: latest-state merge (the MERGE/upsert
  * apply of a CDC feed) and SCD Type-2 history construction.
  *
  * Scale shape: both are ONE window shuffle on the entity key — the
  * minimum possible for per-key ordering semantics. At 100 TB the
  * change feed is hash-partitioned by key; no join, no second exchange
  * (the consecutive-dedup and interval windows share the same
  * partitioning, so Catalyst plans one Exchange for both).
  */
object ChangeCapture {

  /** CDC apply: from a stream of keyed, ordered change rows (upserts +
    * deletes), produce the current state — the LATEST row per key,
    * dropped entirely if that row is a delete.
    *
    * `orderCols` must make the ordering total per key (include a unique
    * id as tiebreak — determinism rule shared with AsOf/sampling). */
  def applyLatest(changes: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !isDelete)
      .drop("__rn")
  }

  /** Snapshot diff: reconcile two keyed snapshots of a table into the
    * rows that were `added`, `removed`, or `changed` between them —
    * the reverse of CDC apply (recover a change feed from two states),
    * and the standard data-validation / backfill-audit primitive.
    *
    * Unchanged rows are NOT emitted: at 100 TB the overwhelming
    * majority of rows are unchanged between snapshots, and a diff that
    * materializes them is a full table copy. Output volume is
    * O(changes).
    *
    * Shape: ONE full outer shuffle join on the key; `changed` is a
    * null-safe comparison over `compareCols` evaluated in the join
    * projection (no second pass). Snapshots written bucketed on the key
    * ([[graft.operators.ScaleOps.writeBucketed]]) diff with ZERO
    * exchanges. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n0 = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val n = compareCols.foldLeft(n0)((d, c) =>
      d.withColumnRenamed(c, s"__new_$c"))
    // foldLeft, not reduce: an empty compareCols is the legitimate
    // membership-only diff (added/removed, nothing ever 'changed')
    val changed = compareCols.map(c =>
      !(col(c) <=> col(s"__new_$c"))).foldLeft(lit(false))(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"old_$c")) ++
        compareCols.map(c => col(s"__new_$c").as(s"new_$c")) :+
        col("change_type"): _*)
  }

  /** SCD Type-2 history: collapse consecutive rows with an unchanged
    * tracked attribute, then emit validity intervals
    * [valid_from, valid_to) per key with `version` numbering and
    * `is_current` on the open interval.
    *
    * Two window functions, ONE shuffle: both windows partition on
    * `keyCol` (lag for change detection, lead/row_number over the
    * collapsed rows re-use the same hash partitioning). */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           orderCol: String, tieBreak: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieBreak))
    val changed = changes
      .withColumn("__prev", lag(col(attrCol), 1).over(wOrd))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(wOrd))
      .withColumn("version", row_number().over(wOrd))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
  }

  /** Merkle-style range digest for cheap table sync: bucket the key
    * space (`bucket = floor(key / width)`) and emit per bucket a row count
    * and an ORDER- AND PARTITIONING-INSENSITIVE content digest — the
    * sum of each row's md5-stable hash over (key + compared columns).
    * Two table versions agree on a bucket iff (n_rows, digest) match
    * (up to sum-of-hash collisions — fine for drift detection, not
    * for adversarial integrity).
    *
    * This is the scale path AROUND [[snapshotDiff]]: the full-outer
    * row diff shuffles both tables end to end; digests are one
    * partial-aggregated scan per side with shuffle O(buckets), and
    * only the buckets that disagree feed the row-level diff —
    * re-syncing a 100 TB replica moves megabytes of digests, then
    * rows from changed ranges only.
    *
    * Digest arithmetic: each row hash < 2^32, so int64 sums are exact
    * up to ~2^31 rows per bucket — unreachable with any sane width.
    * concat_ws skips null columns (same rule both engines); a column
    * whose value could collide with the skip (empty vs null) needs an
    * explicit sentinel upstream.
    *
    * Bucketing is FLOOR division, spelled in pmod arithmetic
    * (`(key - pmod(key, w)) DIV w` — the numerator is exactly
    * divisible, so truncating and flooring engines agree on it) rather
    * than a bare `key DIV w`: Spark's DIV truncates toward zero while
    * floor-division engines (DuckDB `//`) floor, and the two diverge
    * on negative keys. The pmod spelling is exact over the whole
    * signed-long domain, so negative keys bucket identically
    * everywhere. */
  def rangeDigest(df: DataFrame, keyCol: String, width: Long,
                  cols: Seq[String]): DataFrame = {
    require(width > 0, "width must be positive")
    df.select(expr(
        s"($keyCol - pmod($keyCol, $width)) DIV $width").as("bucket"),
        graft.functions.StableHash.stable32(
          concat_ws("\u0001", (keyCol +: cols).map(col): _*)).as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("digest"))
  }

  /** Compare two [[rangeDigest]] outputs: rows only for buckets that
    * DISAGREE — status 'added' (bucket only in new), 'removed' (only
    * in old), 'changed' (present in both, count or digest differs).
    * Buckets in agreement — the overwhelming majority during sync —
    * are never emitted. */
  def digestDiff(oldD: DataFrame, newD: DataFrame): DataFrame = {
    val o = oldD.select(col("bucket"), col("n_rows").as("n_old"),
      col("digest").as("digest_old"))
    val n = newD.select(col("bucket"), col("n_rows").as("n_new"),
      col("digest").as("digest_new"))
    o.join(n, Seq("bucket"), "full_outer")
      .withColumn("status",
        when(col("n_old").isNull, lit("added"))
          .when(col("n_new").isNull, lit("removed"))
          .when(col("n_old") =!= col("n_new") ||
            col("digest_old") =!= col("digest_new"), lit("changed")))
      .filter(col("status").isNotNull)
  }
}
