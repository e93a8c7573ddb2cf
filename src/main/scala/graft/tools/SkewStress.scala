package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Skew stress for the Pregel loops ([[Graph.pageRank]],
  * [[Dedup.minLabelClusters]]): both hash-partition raw node ids, so a
  * supernode's adjacency list lands on ONE partition. Messages TO the
  * hub are map-side combined (reduceByKey) and cannot pile up, but the
  * join step that emits messages FROM the hub's partition does
  * deg(hub) extra work while the median partition does m/parts — this
  * tool measures whether that imbalance actually moves round times.
  *
  * Graph shape (the round-5 verdict's ask): the sf0.1x10 scale — n =
  * 50,000 nodes — with a hub adjacent to 10% of all nodes, over a
  * sparse random background (avg degree 6). Task-time skew is metered
  * per stage via onTaskEnd: max task duration vs the stage median,
  * reported for every stage above a noise floor. Decision rule per the
  * verdict: salt the edge partitioner iff measured skew > 2x median
  * on the loop stages.
  *
  * Usage: runMain graft.tools.SkewStress [nodes] [hubPct] [avgDeg]
  */
object SkewStress {
  private final class TaskMeter extends SparkListener {
    val byStage = new TrieMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null && te.taskMetrics != null) {
        byStage.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer[Long]())
          .synchronized {
            byStage(te.stageId) += te.taskMetrics.executorRunTime
          }
      }
    }
    def report(label: String, floorMs: Long): Unit = {
      val rows = byStage.toSeq.sortBy(_._1).flatMap { case (sid, durs) =>
        val d = durs.toArray.sorted
        if (d.isEmpty || d.last < floorMs) None
        else {
          val med = math.max(d(d.length / 2), 1L)
          Some((sid, d.length, med, d.last, d.last.toDouble / med))
        }
      }
      println(s"[skewstress] === $label: stages with max task >= ${floorMs}ms ===")
      rows.foreach { case (sid, n, med, mx, ratio) =>
        println(f"[skewstress] stage=$sid%-5d tasks=$n%-4d median=${med}%6dms " +
          f"max=${mx}%6dms skew=${ratio}%5.2fx")
      }
      val worst = rows.map(_._5).foldLeft(0.0)(math.max)
      println(f"[skewstress] $label worst-stage skew = ${worst}%.2fx " +
        s"(salt threshold: 2.00x)")
      byStage.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val hubDeg = args.lift(1).map(_.toInt).getOrElse(10) * n / 100
    val avgDeg = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new TaskMeter
    spark.sparkContext.addSparkListener(meter)

    // Hub graph: node 0 adjacent to nodes 1..hubDeg; background edges
    // xorshift-pseudorandom (deterministic, no Random in executors).
    val ids = spark.range(0, n).toDF("id")
    val hub = spark.range(1, hubDeg + 1)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val bg = spark.range(0, n.toLong * avgDeg / 2)
      .select(
        pmod(hash(col("id"), lit(1)).cast("long"), lit(n.toLong)).as("id_a"),
        pmod(hash(col("id"), lit(2)).cast("long"), lit(n.toLong)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val pairs = hub.unionAll(bg)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
      .cache()
    val m = pairs.count()
    println(s"[skewstress] graph: n=$n edges=$m hubDeg=$hubDeg avgDeg=$avgDeg " +
      s"(hub holds ${100.0 * hubDeg / m}%% of edges)")

    // warm-up (JIT + shuffle machinery) on a small slice, then clear
    Graph.pageRank(ids.limit(1000), "id", pairs.limit(1000),
      "id_a", "id_b", 1).count()
    meter.byStage.clear()

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[skewstress] $label%-18s ${sec}%6.2f s rows=$rows%,d")
      meter.report(label, floorMs = 50)
    }

    timed("pagerank_3it") {
      Graph.pageRank(ids, "id", pairs, "id_a", "id_b", 3).count()
    }
    timed("min_label_6r") {
      Dedup.minLabelClusters(ids, "id", pairs, "id_a", "id_b", 6).count()
    }
    spark.stop()
  }
}
