package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE ATOMIC COMMIT — the one ACID capability the per-table
  * commit seam cannot express: N tables move together or not at all
  * (fact + dimension published for the same business instant, a
  * corpus table and its benchmark-exclusion table, …).
  *
  * The protocol rides the SAME no-replace primitives single-table
  * commits use, with ONE atomic decision point:
  *
  *  1. STAGE every table's data (files on disk, nothing published,
  *     [[VersionedTable.stageCommitData]]).
  *  2. For each table, create-exclusive a PENDING MARKER beside the
  *     manifest slot (`_manifests/v<N>.json.pending.<txn>` naming the
  *     decision file), then publish the manifest itself through the
  *     normal create-exclusive path. A marked version is INVISIBLE —
  *     [[VersionedTable.versions]] consults the marker from the same
  *     directory listing it already pays for, so un-marked tables
  *     read at zero extra cost.
  *  3. DECIDE: create-exclusive the decision file with content
  *     `committed`. THIS single create is the commit point for every
  *     participant at once — before it, every reader of every table
  *     sees the old versions; after it, every reader sees the new
  *     ones. A crash anywhere before it leaves nothing visible.
  *  4. SEAL: delete the markers (pure optimization — a committed but
  *     unsealed version already reads as visible through the
  *     decision; a reader catching the marker mid-delete treats the
  *     vanished marker as sealed).
  *
  * Failure anywhere rolls back: the decision file is written
  * `aborted` (create-exclusive — it can never overwrite a
  * `committed`), published manifests are renamed aside
  * (`.json.aborted.<txn>`) so their version slots free up, markers
  * are deleted, staged data is discarded. A COORDINATOR CRASH leaves
  * in-flight markers; those versions stay invisible forever (safe),
  * block the slot for later writers (loud `already committed` on the
  * next commit), and [[resolvePending]] — the janitor, also a `CALL
  * gt.system.resolve_txns` — decides `aborted` for them exclusively
  * (losing that race to a late coordinator correctly seals instead).
  *
  * Writes in one transaction must target DISTINCT tables; per-table
  * optimistic concurrency is unchanged (a concurrent single-table
  * commit that claims a participant's slot first aborts the whole
  * transaction, never half of it).
  */
object TableTxn {

  sealed trait Decision
  case object Committed extends Decision
  case object Aborted extends Decision
  case object InFlight extends Decision
  /** Marker vanished while reading — the txn was sealed (committed). */
  case object Sealed extends Decision

  /** One table's write in a transaction. */
  final case class TxnWrite(table: String, df: DataFrame,
                            append: Boolean,
                            meta: Map[String, String] = Map.empty,
                            statCols: Seq[String] = Nil)

  /** Test seam: invoked with a stage label at each protocol step; a
    * spec throws [[SimulatedCrash]] from here to simulate a
    * coordinator crash at that exact point — a hard crash runs no
    * rollback, exactly like a killed process. Any other exception
    * takes the normal rollback path. */
  private[graft] var failpoint: String => Unit = _ => ()

  /** Thrown by a spec's [[failpoint]]: propagates WITHOUT rollback. */
  private[graft] final class SimulatedCrash(msg: String)
      extends RuntimeException(msg)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8").trim
    } finally in.close()
  }

  /** Read a marker + its decision file. Pure — never writes. */
  private[sources] def decisionOf(f: FileSystem, marker: Path): Decision = {
    val decisionPath =
      try readSmall(f, marker)
      catch { case _: java.io.FileNotFoundException => return Sealed }
    readDecision(f, new Path(decisionPath))
  }

  private def readDecision(f: FileSystem, decision: Path): Decision =
    try {
      if (readSmall(f, decision) == "committed") Committed else Aborted
    } catch { case _: java.io.FileNotFoundException => InFlight }

  /** Create-exclusive decide. Returns the decision that HOLDS after
    * the call (ours, or the one that beat us). */
  private def decide(f: FileSystem, decision: Path,
                     verdict: String): Decision = {
    f.mkdirs(decision.getParent)
    try {
      val out = f.create(decision, false)
      try out.write(verdict.getBytes("UTF-8")) finally out.close()
      if (verdict == "committed") Committed else Aborted
    } catch {
      case _: java.io.IOException => readDecision(f, decision)
    }
  }

  private def markerPath(table: String, v: Int, txnId: String): Path =
    new Path(VersionedTable.manifestDir(table),
      VersionedTable.manifestPath(table, v).getName + s".pending.$txnId")

  /** Commit every write in `writes` as ONE transaction: all tables'
    * new versions become visible at a single instant, or none do.
    * Returns table → committed version. */
  def commitAll(spark: SparkSession,
                writes: Seq[TxnWrite]): Map[String, Int] = {
    require(writes.nonEmpty, "empty transaction")
    require(writes.map(w => VersionedTable.norm(w.table)).distinct.size ==
      writes.size, "a transaction writes each table at most once")
    val txnId = java.util.UUID.randomUUID().toString.take(12)
    val decision = new Path(writes.head.table, s"_txn/$txnId")
    val f = fsOf(spark, decision)

    // 1. stage everything (data on disk, nothing published)
    val staged = scala.collection.mutable.ArrayBuffer
      .empty[(TxnWrite, VersionedTable.StagedCommit)]
    val published = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int)] // (table, version) with marker + manifest
    def rollback(): Unit = {
      // decision first: once `aborted` holds, no reader will ever see
      // a published participant, so the renames below are janitorial
      decide(f, decision, "aborted") match {
        case Committed => return // we lost to our own commit — done
        case _ =>
      }
      published.foreach { case (t, v) =>
        val m = VersionedTable.manifestPath(t, v)
        val ft = fsOf(spark, m)
        ft.rename(m, new Path(m.getParent, m.getName + s".aborted.$txnId"))
        ft.delete(markerPath(t, v, txnId), false)
      }
      staged.foreach { case (_, sc) => sc.discard(spark) }
    }
    try {
      writes.foreach { w =>
        staged += w -> VersionedTable.stageCommitData(spark, w.table,
          w.df, w.append, w.meta + ("txn" -> txnId), w.statCols)
        failpoint(s"staged:${w.table}")
      }
      // 2. marker, then manifest, per table — marked versions are
      // invisible until the decision commits
      staged.foreach { case (w, sc) =>
        val marker = markerPath(sc.table, sc.version, txnId)
        val ft = fsOf(spark, marker)
        ft.mkdirs(marker.getParent)
        val out = ft.create(marker, false)
        try out.write(decision.toString.getBytes("UTF-8"))
        finally out.close()
        failpoint(s"marked:${w.table}")
        VersionedTable.writeManifest(spark, sc.table, sc.version,
          sc.lines)
        published += ((sc.table, sc.version))
        failpoint(s"published:${w.table}")
      }
      // 3. THE commit point
      decide(f, decision, "committed") match {
        case Committed => ()
        case _ => // a concurrent writer aborted us while in flight
          rollback()
          sys.error(s"transaction $txnId aborted by a concurrent " +
            "writer — nothing was published")
      }
      failpoint("decided")
      // 4. seal (committed versions stay visible even if this crashes)
      published.foreach { case (t, v) =>
        fsOf(spark, decision).delete(markerPath(t, v, txnId), false)
      }
      failpoint("sealed")
      published.map { case (t, v) => t -> v }.toMap
    } catch {
      case e: SimulatedCrash => throw e // a dead process rolls nothing back
      case e: Throwable =>
        rollback()
        throw e
    }
  }

  /** Janitor for coordinator crashes: every still-marked version of
    * `table` is resolved — in-flight txns are decided `aborted`
    * (create-exclusive, so losing to a late coordinator's `committed`
    * correctly seals instead), aborted manifests are renamed aside to
    * free their slots, committed markers are sealed. Returns one
    * report line per marker handled. */
  def resolvePending(spark: SparkSession, table: String): Seq[String] = {
    val dir = VersionedTable.manifestDir(table)
    val f = fsOf(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.contains(".json.pending."))
      .flatMap { marker =>
        val name = marker.getName
        val manifest = new Path(dir,
          name.substring(0, name.indexOf(".pending.")))
        val txnId = name.substring(name.indexOf(".pending.") + 9)
        val decisionPath =
          try Some(readSmall(f, marker))
          catch { case _: java.io.FileNotFoundException => None }
        if (decisionPath.isEmpty) Seq.empty else {
        val dp = new Path(decisionPath.get)
        val verdict = readDecision(f, dp) match {
          case InFlight => decide(f, dp, "aborted")
          case d => d
        }
        verdict match {
          case Committed | Sealed =>
            f.delete(marker, false)
            Seq(s"sealed committed ${manifest.getName} (txn $txnId)")
          case _ =>
            if (f.exists(manifest))
              f.rename(manifest,
                new Path(dir, manifest.getName + s".aborted.$txnId"))
            f.delete(marker, false)
            Seq(s"aborted in-flight ${manifest.getName} (txn $txnId)")
        }
        }
      }
  }
}
