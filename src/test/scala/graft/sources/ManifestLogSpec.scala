package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Physical-encoding contract of the manifest commit log: appends
  * publish O(changed lines), not O(table files) (delta frames),
  * checkpoints bound every resolution chain, and vacuum across a
  * delta boundary keeps exactly the `.base` frames surviving chains
  * still resolve through. The LOGICAL manifest contract (what
  * [[VersionedTable.manifest]] returns) is pinned by every other
  * table-layer spec — this one looks at the files on disk. */
class ManifestLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("mlog").toString + "/t"

  private def raw(t: String, v: Int): Seq[String] =
    VersionedTable.readRawManifest(spark, t, v)

  private def isDelta(t: String, v: Int): Boolean =
    raw(t, v).headOption.exists(_.startsWith("delta\t"))

  private def manifestFiles(t: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(t, "_manifests")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq.map(_.getPath.getName).sorted
  }

  test("appends publish delta frames whose size is O(new files)") {
    val t = freshTable()
    // v1: a wide base (many files) — the worst case for full rewrites
    VersionedTable.commit(spark, t,
      spark.range(0, 640).toDF("k").repartition(32), append = false)
    val baseLines = VersionedTable.manifest(spark, t, 1).size
    assert(baseLines >= 32, s"base should be many files, got $baseLines")
    // v2: a one-partition append must not republish the base's lines
    VersionedTable.commit(spark, t,
      Seq(9999L).toDF("k").coalesce(1), append = true)
    assert(isDelta(t, 2), "a small append over a wide base must encode delta")
    val physical = raw(t, 2).size
    assert(physical <= 4,
      s"append's manifest should be O(new files) lines, got $physical")
    // and the LOGICAL list still carries everything
    assert(VersionedTable.manifest(spark, t, 2).size >= baseLines + 1)
    assert(VersionedTable.read(spark, t).count() == 641L)
  }

  test("checkpoint versions are full frames; chains never cross them") {
    val t = freshTable()
    val n = VersionedTable.CheckpointInterval + 3
    (1 to n).foreach { i =>
      VersionedTable.commit(spark, t, Seq(i.toLong).toDF("k").coalesce(1),
        append = i > 1)
    }
    assert(!isDelta(t, 1), "v1 is always full")
    assert(!isDelta(t, VersionedTable.CheckpointInterval),
      "the checkpoint version must be a full frame")
    // v2's delta ties the 2-line snapshot (tie → full); from v3 on the
    // carried list outweighs the one-line change
    assert(isDelta(t, 3) && isDelta(t, n),
      "in-between appends encode delta")
    // every version reconstructs its exact prefix of the history
    (1 to n).foreach { v =>
      assert(VersionedTable.read(spark, t, Some(v))
        .as[Long].collect().sorted.toSeq == (1L to v.toLong),
        s"version $v")
    }
  }

  test("an overwrite that shrinks the table falls back to a full frame") {
    val t = freshTable()
    VersionedTable.commit(spark, t,
      spark.range(0, 320).toDF("k").repartition(16), append = false)
    VersionedTable.commit(spark, t, Seq(1L).toDF("k").coalesce(1),
      append = false)
    // removing 16 lines + adding 1 is BIGGER than the 1-line snapshot
    assert(!isDelta(t, 2),
      "delta must only be chosen when strictly smaller than the snapshot")
    assert(VersionedTable.read(spark, t).count() == 1L)
  }

  test("vacuum across a delta boundary keeps the chain's .base frames") {
    val t = freshTable()
    VersionedTable.commit(spark, t, Seq(1L).toDF("k").coalesce(1),
      append = false)
    // v2 is an OVERWRITE: its delta vs v1 (remove a file, add a file)
    // is no smaller than the snapshot, so it publishes full — the kept
    // chain will bottom out here, and v1's removal below is what
    // proves non-chain retirees still die
    VersionedTable.commit(spark, t, Seq(1L, 2L).toDF("k").coalesce(1),
      append = false)
    (3 to 6).foreach { i =>
      VersionedTable.commit(spark, t, Seq(i.toLong).toDF("k").coalesce(1),
        append = true)
    }
    assert(isDelta(t, 5), "precondition: oldest-kept will be a delta")
    assert(!isDelta(t, 2), "precondition: the chain's base is full")
    VersionedTable.vacuum(spark, t, keepLast = 2)
    // logically: only v5, v6 remain, both readable
    assert(VersionedTable.versions(spark, t) == Seq(5, 6))
    assert(VersionedTable.read(spark, t, Some(5))
      .as[Long].collect().sorted.toSeq == (1L to 5L))
    assert(VersionedTable.read(spark, t, Some(6))
      .as[Long].collect().sorted.toSeq == (1L to 6L))
    // physically: v5's chain (v4 → v3 → v2, where v2 is full — v1's
    // removal is what proves non-chain retirees still die) survives as
    // .base, nothing else
    val names = manifestFiles(t)
    assert(names.filter(_.endsWith(".json")).map(_.drop(1).take(8).toInt)
      == Seq(5, 6))
    assert(names.filter(_.endsWith(".base")).map(_.drop(1).take(8).toInt)
      == Seq(2, 3, 4))
    // a later vacuum whose kept chain starts at a checkpoint sweeps the
    // carcasses: append through the next checkpoint, vacuum again
    (7 to VersionedTable.CheckpointInterval + 1).foreach { i =>
      VersionedTable.commit(spark, t, Seq(i.toLong).toDF("k").coalesce(1),
        append = true)
    }
    VersionedTable.vacuum(spark, t, keepLast = 2)
    val after = manifestFiles(t)
    val ck = VersionedTable.CheckpointInterval
    // keep.head == the v10 checkpoint → no chain below it → every
    // carcass (and every newly retired manifest) is gone
    assert(after.forall(!_.endsWith(".base")),
      s"no bases survive a checkpoint-rooted kept chain, got $after")
    assert(VersionedTable.read(spark, t)
      .as[Long].collect().sorted.toSeq == (1L to (ck + 1).toLong))
  }

  test("legacy full-format manifests read unchanged and chain as bases") {
    val t = freshTable()
    // hand-write a full-format v1 the way the pre-log layer did, then
    // commit a delta v2 on top of it
    val df = Seq(1L, 2L).toDF("k").coalesce(1)
    val dataDir = new org.apache.hadoop.fs.Path(t, "data/legacy")
    df.write.parquet(dataDir.toString)
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dataDir).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
    VersionedTable.writeManifest(spark, t, 1, files)
    assert(!isDelta(t, 1))
    VersionedTable.commit(spark, t, Seq(3L).toDF("k").coalesce(1),
      append = true)
    assert(VersionedTable.read(spark, t)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
