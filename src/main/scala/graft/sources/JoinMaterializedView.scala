package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE-OVER-JOIN views — the star-join
  * rollup ("revenue by customer segment") kept fresh without
  * recomputing the join: a refresh folds the standard delta-join
  * algebra
  *
  * {{{  Δ(A ⋈ B)  =  ΔA ⋈ B_old  ∪  A_new ⋈ ΔB  }}}
  *
  * into the stored groups, where ΔA/ΔB are the two tables' signed
  * change feeds ([[VersionedTable.readChanges]], O(changed files)
  * each) and the `_old`/`_new` snapshots come from the table layer's
  * time travel — the recorded source versions make both sides of the
  * identity exactly reconstructable, which is what lets BOTH tables
  * mutate between refreshes (the classic incremental-view-maintenance
  * rule, Griffin & Libkin-style, realized on table-format primitives).
  *
  * Cost model at scale: the `ΔA ⋈ B_old` term is a broadcast of the
  * fact delta against the dimension; the `A_new ⋈ ΔB` term — the
  * expensive one, a dimension change re-weighting matching FACT rows —
  * prunes the fact scan when the fact table is [[VersionedTable.commitBucketed]]
  * on the join key: only the buckets that can hold the changed keys
  * are read (manifest-only decision; falls back to the full fact scan
  * on an unbucketed table). Group counts and integral sums fold
  * exactly; min/max are not maintainable (same limitation as
  * [[MaterializedView]]).
  *
  * The view is a versioned table; each refresh commits atomically with
  * BOTH source versions in its metadata, so a crash leaves the old or
  * the new consistent view, never a half-refresh. Fact and dimension
  * column names must be disjoint apart from the join key. */
object JoinMaterializedView {

  private val FactVKey = "fact_version"
  private val DimVKey = "dim_version"
  private val KeyKey = "join_key"
  private val GroupKey = "group_cols"
  private val SumKey = "sum_cols"

  private def dropBucketCols(df: DataFrame): DataFrame =
    df.columns.filter(_.startsWith("__bucket_")).foldLeft(df)(_ drop _)

  private def aggregate(joined: DataFrame, groupCols: Seq[String],
                        sumCols: Seq[String]): DataFrame =
    joined.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c =>
          sum(coalesce(col(c).cast("long"), lit(0L))).as(s"sum_$c")): _*)

  /** Full build from both tables' LATEST snapshots. `groupCols` and
    * `sumCols` may come from either side of the join. Returns the
    * committed view version. */
  def build(spark: SparkSession, factTable: String, dimTable: String,
            mvDir: String, key: String, groupCols: Seq[String],
            sumCols: Seq[String],
            extraMeta: Map[String, String] = Map.empty): Int = {
    require(groupCols.nonEmpty, "need at least one group column")
    val fv = VersionedTable.versions(spark, factTable).last
    val dv = VersionedTable.versions(spark, dimTable).last
    val joined = dropBucketCols(
      VersionedTable.read(spark, factTable, Some(fv)))
      .join(dropBucketCols(VersionedTable.read(spark, dimTable, Some(dv))),
        Seq(key))
    VersionedTable.commit(spark, mvDir,
      aggregate(joined, groupCols, sumCols), append = false,
      meta = extraMeta ++ Map(
        FactVKey -> fv.toString, DimVKey -> dv.toString, KeyKey -> key,
        GroupKey -> groupCols.mkString(","),
        SumKey -> sumCols.mkString(",")))
  }

  /** The view's current contents (group cols, `cnt`, `sum_<c>`...). */
  def read(spark: SparkSession, mvDir: String): DataFrame =
    VersionedTable.read(spark, mvDir)

  /** A table's signed change feed between two versions, as the joined
    * row's columns plus a signed multiplicity `__d`. */
  private def signedFeed(spark: SparkSession, table: String,
                         v0: Int, v1: Int): DataFrame = {
    val feed = VersionedTable.readChanges(spark, table, v0, v1)
    dropBucketCols(feed)
      .withColumn("__d",
        when(col("change") === "insert", col("n")).otherwise(-col("n")))
      .drop("change", "n")
  }

  /** Test seam: fired `(bucketsRead, nBuckets)` when a refresh's
    * `A_new ⋈ ΔB` term bucket-prunes the fact read, `(-1, -1)` when it
    * falls back to the full scan. */
  private[sources] var factPruneNotifier: (Int, Int) => Unit =
    (_, _) => ()

  /** `A_new` restricted (when the fact table is bucketed on the join
    * key) to the buckets that can hold `keys` — the manifest-pruned
    * fact read the `A_new ⋈ ΔB` term pays instead of a table scan. */
  private def factForKeys(spark: SparkSession, factTable: String,
                          key: String, keys: DataFrame): DataFrame =
    VersionedTable.bucketSpecOf(spark, factTable) match {
      case Some((k, n)) if k == key =>
        val buckets = keys
          .select(pmod(hash(col(key)), lit(n)).cast("string").as("b"))
          .distinct().collect().map(_.getString(0)).toSeq
        factPruneNotifier(buckets.size, n)
        if (buckets.isEmpty)
          VersionedTable.read(spark, factTable).limit(0)
        else VersionedTable.readPartitions(spark, factTable,
          s"__bucket_${key}_$n", buckets)
      case _ =>
        factPruneNotifier(-1, -1)
        VersionedTable.read(spark, factTable)
    }

  /** Incremental refresh to both sources' heads. No-op when caught
    * up; otherwise folds `ΔA ⋈ B_old ∪ A_new ⋈ ΔB` (each term's
    * multiplicity = product of its sides' signed counts) into the
    * stored groups and commits. Groups folding to zero count drop —
    * the view stays identical to a from-scratch [[build]]. */
  def refresh(spark: SparkSession, factTable: String, dimTable: String,
              mvDir: String): Int = {
    val mvV = VersionedTable.versions(spark, mvDir).last
    val meta = VersionedTable.metaOf(
      VersionedTable.manifest(spark, mvDir, mvV))
    val (fv0, dv0) = (meta(FactVKey).toInt, meta(DimVKey).toInt)
    val key = meta(KeyKey)
    val groupCols = meta(GroupKey).split(",").toSeq.filter(_.nonEmpty)
    val sumCols = meta(SumKey).split(",").toSeq.filter(_.nonEmpty)
    val fv1 = VersionedTable.versions(spark, factTable).last
    val dv1 = VersionedTable.versions(spark, dimTable).last
    if (fv1 == fv0 && dv1 == dv0) return mvV

    // ΔA ⋈ B_old: the fact delta against the dimension AS THE VIEW
    // LAST SAW IT (time travel pins B_old even though B moved on)
    val dA = signedFeed(spark, factTable, fv0, fv1)
    val termA = dA.join(
      dropBucketCols(VersionedTable.read(spark, dimTable, Some(dv0))),
      Seq(key))
    // A_new ⋈ ΔB: the dimension delta re-weighting matching fact rows
    // — bucket-pruned when the fact table's spec covers the key
    val dB = signedFeed(spark, dimTable, dv0, dv1)
    val termB = dropBucketCols(
      factForKeys(spark, factTable, key, dB.select(key)))
      .join(dB, Seq(key))
    val delta = termA.unionByName(termB, allowMissingColumns = false)
    val deltaAgg = delta.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__d")).as("dcnt"),
        sumCols.map(c =>
          sum(coalesce(col(c).cast("long"), lit(0L)) * col("__d"))
            .as(s"dsum_$c")): _*)

    val mv = VersionedTable.read(spark, mvDir)
    val cond = groupCols.map(c => mv(c) <=> deltaAgg(c)).reduce(_ && _)
    val merged = mv.join(deltaAgg, cond, "full_outer")
      .select(groupCols.map(c => coalesce(mv(c), deltaAgg(c)).as(c)) ++
        Seq((coalesce(col("cnt"), lit(0L)) +
          coalesce(col("dcnt"), lit(0L))).as("cnt")) ++
        sumCols.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"dsum_$c"), lit(0L))).as(s"sum_$c")): _*)
      .filter(col("cnt") > 0)
    VersionedTable.commit(spark, mvDir, merged, append = false,
      meta = meta + (FactVKey -> fv1.toString) + (DimVKey -> dv1.toString))
  }
}
