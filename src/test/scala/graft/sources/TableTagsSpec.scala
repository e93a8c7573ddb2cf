package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Version tags ([[VersionedTable.tagVersion]]): named refs that PIN
  * snapshots against vacuum. */
class TableTagsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString + "/t"

  test("tag, read by name, drop; create is exclusive") {
    val t = fresh("vtag")
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      append = true)
    VersionedTable.tagVersion(spark, t, "eval-v1", 1)
    assert(VersionedTable.tagsOf(spark, t) == Map("eval-v1" -> 1))
    assert(VersionedTable.readTag(spark, t, "eval-v1").count() == 1)
    intercept[Exception] { // no silent retarget
      VersionedTable.tagVersion(spark, t, "eval-v1", 2)
    }
    intercept[IllegalArgumentException] { // uncommitted version
      VersionedTable.tagVersion(spark, t, "later", 99)
    }
    VersionedTable.dropTag(spark, t, "eval-v1")
    VersionedTable.dropTag(spark, t, "eval-v1") // idempotent
    assert(VersionedTable.tagsOf(spark, t).isEmpty)
  }

  test("a tag pins its version through vacuum; drop makes it vacuumable") {
    val t = fresh("vtagpin")
    (1 to 6).foreach { i =>
      VersionedTable.commit(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "v"),
        append = i > 1)
    }
    VersionedTable.tagVersion(spark, t, "audit", 2)
    val (retired, _) = VersionedTable.vacuumDryRun(spark, t, keepLast = 2)
    assert(!retired.contains(2) && retired.contains(3))
    VersionedTable.vacuum(spark, t, keepLast = 2)
    // versions 5 and 6 (the suffix) and 2 (the pin) survive
    assert(VersionedTable.versions(spark, t) == Seq(2, 5, 6))
    assert(VersionedTable.readTag(spark, t, "audit").count() == 2)
    assert(VersionedTable.read(spark, t).count() == 6)
    // drop the pin: the next vacuum retires version 2
    VersionedTable.dropTag(spark, t, "audit")
    VersionedTable.vacuum(spark, t, keepLast = 2)
    assert(VersionedTable.versions(spark, t) == Seq(5, 6))
  }

  test("a pinned DELTA-frame version keeps its chain bases alive") {
    val t = fresh("vtagchain")
    // many appends so mid-chain versions encode as delta frames
    (1 to 8).foreach { i =>
      VersionedTable.commit(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "v"),
        append = i > 1)
    }
    // v5 is a delta frame (not v1, not a checkpoint): pin it
    VersionedTable.tagVersion(spark, t, "mid", 5)
    VersionedTable.vacuum(spark, t, keepLast = 1)
    assert(VersionedTable.versions(spark, t) == Seq(5, 8))
    // the pinned delta still resolves through its .base chain
    assert(VersionedTable.readTag(spark, t, "mid").count() == 5)
    assert(VersionedTable.read(spark, t, Some(5))
      .as[(Long, String)].collect().map(_._1).toSet == (1L to 5L).toSet)
  }
}
