package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** A filesystem with OBJECT-STORE rename semantics: "rename" silently
  * REPLACES an existing destination (copy+delete, last-writer-wins) —
  * the exact behavior that would let two concurrent writers both win
  * a version if the commit publish trusted it. */
class ReplacingRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "fakes3"
  override def getUri: java.net.URI = java.net.URI.create("fakes3:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}

/** The commit-publish contract on filesystems without an atomic
  * no-replace primitive: REFUSE by default, publish through a
  * registered putIfAbsent publisher, or accept the documented race
  * only via the explicit force-rename opt-in. */
class CommitPublishSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  override def beforeAll(): Unit = {
    super.beforeAll()
    conf.set("fs.fakes3.impl", classOf[ReplacingRenameFs].getName)
    conf.set("fs.fakes3.impl.disable.cache", "true")
  }

  private def freshTable(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    s"fakes3:$dir/t"
  }

  test("a scheme whose rename replaces is REFUSED with the remedy " +
    "named — never silently published") {
    val t = freshTable("cps-refuse")
    val e = intercept[RuntimeException] {
      VersionedTable.writeManifest(spark, t, 1, Seq("meta\tk=v"))
    }
    assert(e.getMessage.contains("no-replace"), e.getMessage)
    assert(e.getMessage.contains("registerCommitPublisher"), e.getMessage)
    assert(e.getMessage.contains(VersionedTable.ForceRenameKey),
      e.getMessage)
    assert(VersionedTable.versions(spark, t).isEmpty,
      "a refused publish must leave nothing visible")
  }

  test("graft.commit.force-rename opts a single-writer deployment " +
    "into the documented rename publish") {
    val t = freshTable("cps-force")
    conf.setBoolean(VersionedTable.ForceRenameKey, true)
    try {
      VersionedTable.writeManifest(spark, t, 1, Seq("meta\tk=v"))
      assert(VersionedTable.versions(spark, t) == Seq(1))
    } finally conf.setBoolean(VersionedTable.ForceRenameKey, false)
  }

  test("a registered putIfAbsent publisher carries the commit and a " +
    "double-win is refused, not silently replaced") {
    val t = freshTable("cps-seam")
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    // stand-in for a store's conditional put (single-threaded spec):
    // publish iff absent, refuse otherwise
    VersionedTable.registerCommitPublisher("fakes3") { (f, tmp, target) =>
      calls.incrementAndGet()
      if (f.exists(target)) false
      else f.rename(tmp, target)
    }
    try {
      VersionedTable.writeManifest(spark, t, 1, Seq("meta\tk=v"))
      assert(calls.get == 1, "the registered publisher must be used")
      assert(VersionedTable.versions(spark, t) == Seq(1))
      // a concurrent writer already took v2: the late publish must
      // LOSE loudly and the winner's manifest must survive verbatim
      VersionedTable.writeManifest(spark, t, 2, Seq("meta\twinner=1"))
      val e = intercept[RuntimeException] {
        VersionedTable.writeManifest(spark, t, 2, Seq("meta\twinner=2"))
      }
      assert(e.getMessage.contains("already committed"), e.getMessage)
      assert(VersionedTable.manifest(spark, t, 2)
        .exists(_.contains("winner=1")),
        "the race winner's commit must be intact")
      assert(!VersionedTable.manifest(spark, t, 2)
        .exists(_.contains("winner=2")))
    } finally VersionedTable.unregisterCommitPublisher("fakes3")
  }

  test("local 'file' commits still publish via link(2) — unaffected " +
    "by the seam") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cps-file").toString
    val t = s"$dir/t"
    VersionedTable.commit(spark, t, Seq((1, "a")).toDF("k", "s"),
      append = false)
    assert(VersionedTable.versions(spark, t) == Seq(1))
    assert(VersionedTable.read(spark, t).count() == 1L)
  }
}
