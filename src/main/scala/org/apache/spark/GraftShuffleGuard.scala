package org.apache.spark

import org.apache.spark.rdd.RDD

/** The one `private[spark]` doorway the row-level read guard needs:
  * asking the driver's MapOutputTracker whether a shuffle's map
  * outputs already exist. An RDD computed inside FOREIGN tasks (a
  * DSv2 reader wrapping an already-planned Spark plan) can resolve a
  * shuffle ONLY when its map stage already ran — e.g. AQE materialized
  * the exchange at planning time. An un-materialized shuffle would
  * make those tasks fetch blocks from stages that never ran. */
object GraftShuffleGuard {

  /** Shuffle ids in `rdd`'s lineage whose map outputs are NOT fully
    * available — empty means every shuffle (if any) is materialized
    * and the RDD is safe to compute from arbitrary tasks. Driver-side,
    * O(lineage). The walk stops at a materialized shuffle: everything
    * upstream of it already ran. */
  def unmaterializedShuffles(rdd: RDD[_]): Seq[Int] = {
    val tracker = SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m
      case _ => return Seq.empty // executor side: nothing to check
    }
    val seen = new java.util.IdentityHashMap[RDD[_], AnyRef]()
    val bad = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(r: RDD[_]): Unit = {
      if (seen.containsKey(r)) return
      seen.put(r, java.lang.Boolean.TRUE)
      r.dependencies.foreach {
        case s: ShuffleDependency[_, _, _] =>
          if (tracker.getNumAvailableOutputs(s.shuffleId) <
              s.rdd.partitions.length)
            bad += s.shuffleId
        case d => walk(d.rdd)
      }
    }
    walk(rdd)
    bad.toSeq
  }
}
