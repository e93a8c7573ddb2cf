package graft.sources

import java.util.concurrent.{Callable, Executors, ThreadFactory}

/** Shared driver-side pool for independent metadata I/Os (parquet
  * footer reads, file stats): N small reads issued serially put
  * N × per-open latency on the caller's critical path — at object-store
  * latencies that is the dominant cost of any per-file metadata pass.
  * Sized like Spark's own driver listing pools (bounded, daemon
  * threads, shared JVM-wide); CPU work stays tiny per task, so the
  * pool never competes meaningfully with executor threads. */
private[sources] object DriverPool {

  private lazy val pool = Executors.newFixedThreadPool(
    math.min(32, math.max(4, Runtime.getRuntime.availableProcessors())),
    new ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-driver-meta-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  /** Map `f` over `items` in parallel, preserving order. Exceptions
    * propagate to the caller (first failure, unwrapped). */
  def mapParallel[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    import scala.jdk.CollectionConverters._
    val futures = pool.invokeAll(
      items.map(a => new Callable[B] { override def call(): B = f(a) })
        .asJava)
    futures.asScala.toSeq.map { fut =>
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      }
    }
  }
}
