package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate views over a [[VersionedTable]]
  * — the "don't recompute the 100 TB rollup" pattern: a grouped
  * count/sum view is built once from a snapshot, then each refresh
  * reads ONLY the change feed between the view's recorded source
  * version and the source's head, folds the signed deltas into the
  * stored groups, and commits the result as the next view version.
  *
  * Cost model at scale: [[refresh]] I/O is O(changed files) (the feed
  * prunes carried files by manifest diff alone), its shuffle is
  * O(delta groups) + O(view groups) for the outer-join fold — never a
  * rescan of the source. Count and sum are SUBTRACTABLE, which is
  * what makes delete/update deltas foldable; averages are derived
  * (`sum_x / cnt`) and min/max are not maintainable this way (a
  * deleted extremum needs a rescan — the classic MV limitation).
  *
  * The view is itself a versioned table: every refresh is an atomic
  * commit carrying `source_version` (plus the group/sum column lists)
  * as commit metadata, so a crash between any two steps leaves either
  * the old consistent view or the new one — never a half-refresh —
  * and the view time-travels like any table. Refresh requires the
  * recorded source version to still be committed (don't [[VersionedTable.vacuum]]
  * the source past your views' watermarks; re-[[build]] if you did).
  *
  * Sum columns must be integral (they are cast to long and folded
  * exactly; NULL contributes 0) — pre-scale decimals to integer units
  * (cents, micros) upstream, the same exactness discipline every gate
  * query in this repo uses.
  */
object MaterializedView {

  private val SrcKey = "source_version"
  private val GroupKey = "group_cols"
  private val SumKey = "sum_cols"

  private def aggregate(df: DataFrame, groupCols: Seq[String],
                        sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c =>
          sum(coalesce(col(c).cast("long"), lit(0L))).as(s"sum_$c")): _*)

  /** Full build from the source's LATEST snapshot; commits MV version
    * 1 (or a fresh full version on an existing view). Returns the
    * committed view version. */
  def build(spark: SparkSession, sourceTable: String, mvDir: String,
            groupCols: Seq[String], sumCols: Seq[String],
            extraMeta: Map[String, String] = Map.empty): Int = {
    require(groupCols.nonEmpty, "need at least one group column")
    val sv = VersionedTable.versions(spark, sourceTable).last
    val agg = aggregate(
      VersionedTable.read(spark, sourceTable, Some(sv)), groupCols, sumCols)
    VersionedTable.commit(spark, mvDir, agg, append = false,
      meta = extraMeta ++ Map(
        SrcKey -> sv.toString,
        GroupKey -> groupCols.mkString(","),
        SumKey -> sumCols.mkString(",")))
  }

  /** The view's current contents (group cols, `cnt`, `sum_<c>`...). */
  def read(spark: SparkSession, mvDir: String): DataFrame =
    VersionedTable.read(spark, mvDir)

  /** The source version the view's (given or latest) version reflects. */
  def sourceVersion(spark: SparkSession, mvDir: String,
                    version: Option[Int] = None): Int = {
    val v = version.getOrElse(VersionedTable.versions(spark, mvDir).last)
    VersionedTable.metaOf(VersionedTable.manifest(spark, mvDir, v))(SrcKey)
      .toInt
  }

  /** Incremental refresh to the source's head. No-op (returns the
    * current view version) when already caught up; otherwise folds the
    * change feed's signed deltas into the stored groups and commits.
    * Groups whose count reaches zero are dropped — the view never
    * holds phantom empty groups, matching a from-scratch [[build]]. */
  def refresh(spark: SparkSession, sourceTable: String,
              mvDir: String): Int = {
    val mvV = VersionedTable.versions(spark, mvDir).last
    val meta = VersionedTable.metaOf(
      VersionedTable.manifest(spark, mvDir, mvV))
    val sv0 = meta(SrcKey).toInt
    val groupCols = meta(GroupKey).split(",").toSeq.filter(_.nonEmpty)
    val sumCols = meta(SumKey).split(",").toSeq.filter(_.nonEmpty)
    val sv1 = VersionedTable.versions(spark, sourceTable).last
    if (sv1 == sv0) return mvV
    val feed = VersionedTable.readChanges(spark, sourceTable, sv0, sv1)
    val signed: Column =
      when(col("change") === "insert", col("n")).otherwise(-col("n"))
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(signed).as("dcnt"),
        sumCols.map(c =>
          sum(coalesce(col(c).cast("long"), lit(0L)) * signed)
            .as(s"dsum_$c")): _*)
    val mv = VersionedTable.read(spark, mvDir)
    // NULL-SAFE group equality: a NULL group key is a real group
    val cond = groupCols.map(c => mv(c) <=> delta(c)).reduce(_ && _)
    val merged = mv.join(delta, cond, "full_outer")
      .select(groupCols.map(c => coalesce(mv(c), delta(c)).as(c)) ++
        Seq((coalesce(col("cnt"), lit(0L)) +
          coalesce(col("dcnt"), lit(0L))).as("cnt")) ++
        sumCols.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"dsum_$c"), lit(0L))).as(s"sum_$c")): _*)
      .filter(col("cnt") > 0)
    VersionedTable.commit(spark, mvDir, merged, append = false,
      meta = meta + (SrcKey -> sv1.toString))
  }
}
