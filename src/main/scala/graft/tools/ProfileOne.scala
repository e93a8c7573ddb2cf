package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB time attribution for one query (optimization-round
  * instrument): runs the named query with a SparkListener recording
  * every job's wall time, call site, and aggregate task metrics, then
  * prints the jobs sorted by duration plus the driver-side gaps
  * (time between jobs = driver work: planning, manifest I/O, footer
  * reads, JDBC, collect post-processing).
  *
  * Usage: runMain graft.tools.ProfileOne <sfDir> <query>[,<query>...]
  */
object ProfileOne {

  private final case class JobRec(id: Int, start: Long, var end: Long,
                                  site: String, desc: String,
                                  var tasks: Int = 0,
                                  var taskTimeMs: Long = 0L,
                                  var shufWrite: Long = 0L,
                                  var shufRead: Long = 0L,
                                  var inBytes: Long = 0L)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (recording) synchronized {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs(e.jobId) = JobRec(e.jobId, e.time, e.time, site, desc)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (recording) synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (recording) synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              j.taskTimeMs += m.executorRunTime
              j.shufWrite += m.shuffleWriteMetrics.bytesWritten
              j.shufRead += m.shuffleReadMetrics.totalBytesRead
              j.inBytes += m.inputMetrics.bytesRead
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm-up (codegen/JIT/file-index caches), unrecorded
      fn(spark, sfDir).queryExecution.toRdd.count()
      spark.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(tb => spark.catalog.dropTempView(tb.name))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      jobs.clear(); stageToJob.clear()
      recording = true
      val t0 = System.nanoTime()
      val t0ms = System.currentTimeMillis()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wallSec = (System.nanoTime() - t0) / 1e9
      recording = false
      // listener bus is async — give end events a moment to land
      Thread.sleep(800)
      println(f"%n[profile] ===== $name wall=${wallSec}%.3f s " +
        f"jobs=${jobs.size} =====")
      val recs = jobs.values.toSeq
      val jobSec = recs.map(r => (r.end - r.start) / 1e3).sum
      println(f"[profile] job-covered=${jobSec}%.3f s " +
        f"driver-gaps=${wallSec - jobSec}%.3f s")
      recs.sortBy(r => -(r.end - r.start)).take(40).foreach { r =>
        val d = (r.end - r.start) / 1e3
        val off = (r.start - t0ms) / 1e3
        val desc = if (r.desc.nonEmpty) s" «${r.desc.take(60)}»" else ""
        println(f"[profile]  job ${r.id}%4d +${off}%7.3f ${d}%7.3f s " +
          f"tasks=${r.tasks}%4d taskTime=${r.taskTimeMs / 1e3}%8.2f s " +
          f"in=${r.inBytes / 1e6}%8.1f MB sw=${r.shufWrite / 1e6}%7.1f MB " +
          f"sr=${r.shufRead / 1e6}%7.1f MB  ${r.site}%s$desc")
      }
      // biggest gaps between consecutive jobs (driver-side work)
      val sorted = recs.sortBy(_.start)
      val gaps = (Seq((t0ms, t0ms)) ++ sorted.map(r => (r.start, r.end)))
        .sliding(2).collect {
          case Seq((_, e1), (s2, _)) if s2 - e1 > 50 =>
            ((s2 - e1) / 1e3, (e1 - t0ms) / 1e3)
        }.toSeq
      gaps.sortBy(-_._1).take(12).foreach { case (g, at) =>
        println(f"[profile]  gap +${at}%7.3f ${g}%7.3f s (driver)")
      }
    }
    spark.stop()
  }
}
