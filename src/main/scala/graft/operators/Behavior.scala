package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over an event stream: ordered funnel
  * progression and cohort retention. Both are classic OLAP shapes a user
  * of the reference engine would run against clickstream-shaped tables.
  *
  * Determinism: all time math happens in the epoch-microsecond integer
  * domain (see Tables.events), and every window that feeds an
  * order-dependent running value carries a unique tiebreak column.
  *
  * Scale: both operators shuffle once on the entity key (user), never on
  * raw event volume; the funnel's cascaded running minima are three
  * Window projections over the SAME partitioning + ordering, so Catalyst
  * plans one Exchange + one Sort and evaluates the cascade in-place.
  */
object Behavior {

  /** Ordered K-stage funnel: for each entity, the earliest timestamp of
    * stage i that occurs at-or-after the earliest qualifying stage i-1.
    *
    * Implementation: one window spec (entity, ordered by time with a
    * unique tiebreak), one running conditional-min column per stage —
    * stage i's running min only admits rows where stage i-1's running
    * min is already non-null at that row, which encodes the "after"
    * ordering without a self-join per stage. The final per-entity value
    * of a running min is its overall min, so a plain groupBy collapses
    * the cascade.
    *
    * Output: one row per entity that reached stage 1, with the stage-i
    * completion timestamps (null once the funnel is abandoned) and the
    * deepest stage reached.
    */
  def funnel(
      events: DataFrame,
      entity: Column,
      stageCol: Column,
      stages: Seq[String],
      tsUs: Column,
      tiebreak: Column): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(entity).orderBy(tsUs.asc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Cascade of running conditional minima; each step is a separate
    // projection because stage i references stage i-1's window output.
    val withRuns = stages.zipWithIndex.foldLeft(
      events.select(entity.as("__ent"), stageCol.as("__stage"),
        tsUs.as("__ts"), tiebreak.as("__tb"))) { case (df, (stage, i)) =>
      val qualifies =
        if (i == 0) df("__stage") === stage
        else df("__stage") === stage && col(s"__run_${i - 1}").isNotNull
      df.withColumn(s"__run_$i", min(when(qualifies, df("__ts"))).over(w))
    }

    val stageAggs = stages.indices.map(i =>
      min(col(s"__run_$i")).as(s"ts_stage${i + 1}"))
    val reached = stages.indices.reverse.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"ts_stage${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withRuns.groupBy(col("__ent").as("entity_id"))
      .agg(stageAggs.head, stageAggs.tail: _*)
      .withColumn("stage_reached", reached)
      .filter(col("ts_stage1").isNotNull)
  }

  /** Cohort retention matrix: entities are cohorted by the day of their
    * first event; output counts distinct active entities per
    * (cohort_day, day_offset) cell. Days are integer epoch-days derived
    * from epoch-microseconds (engine-portable).
    *
    * One window shuffle on the entity key computes the cohort day; the
    * final cell aggregation shuffles O(cells), not O(events).
    */
  def cohortRetention(
      events: DataFrame,
      entity: Column,
      tsUs: Column): DataFrame = {
    val UsPerDay = 86400000000L
    val byEnt = Window.partitionBy(entity)
    events
      .select(entity.as("entity_id"), (tsUs / UsPerDay).cast("long").as("day"))
      .withColumn("cohort_day", min(col("day")).over(byEnt))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("entity_id")).as("n_active"))
  }
}
