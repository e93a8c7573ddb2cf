package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Protocol feature gates ([[VersionedTable.requireFeature]] /
  * `_protocol`): tables using capabilities a build cannot honor make
  * that build fail LOUDLY instead of silently misreading. */
class TableProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString + "/t"

  private def seed(t: String): Unit =
    VersionedTable.commit(spark, t,
      (1L to 10L).map(k => (k, k * 2)).toDF("k", "v"), append = false)

  /** Simulate a FUTURE build's table: write a raw `_protocol` with a
    * feature this build has never heard of. */
  private def alienProtocol(t: String, lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(t, "_protocol")
    val f = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("an unknown READER feature blocks reads loudly, naming it") {
    val t = fresh("vprr")
    seed(t)
    alienProtocol(t, Seq("r\tcolumn-mapping-v9", "w\tcolumn-mapping-v9"))
    val e = intercept[RuntimeException] { VersionedTable.read(spark, t) }
    assert(e.getMessage.contains("column-mapping-v9") &&
      e.getMessage.contains("reader"))
    // writes are blocked too (they begin with the same entry point)
    intercept[RuntimeException] {
      VersionedTable.commit(spark, t, Seq((11L, 22L)).toDF("k", "v"),
        append = true)
    }
  }

  test("an unknown WRITER-ONLY feature blocks commits but not reads") {
    val t = fresh("vprw")
    seed(t)
    alienProtocol(t, Seq("w\tdeferred-compaction-v3"))
    assert(VersionedTable.read(spark, t).count() == 10)
    assert(VersionedTable.readChanges(spark, t, 1, 1) != null)
    val e = intercept[RuntimeException] {
      VersionedTable.commit(spark, t, Seq((11L, 22L)).toDF("k", "v"),
        append = true)
    }
    assert(e.getMessage.contains("deferred-compaction-v3") &&
      e.getMessage.contains("writer"))
    // the refused commit left no version behind
    assert(VersionedTable.versions(spark, t) == Seq(1))
  }

  test("requireFeature: supported round-trips, unsupported refused, idempotent") {
    val t = fresh("vprf")
    seed(t)
    VersionedTable.requireFeature(spark, t, "base")
    VersionedTable.requireFeature(spark, t, "base") // idempotent
    assert(VersionedTable.protocolOf(spark, t) ==
      (Set("base"), Set("base")))
    // this build still reads and writes its own required features
    VersionedTable.commit(spark, t, Seq((11L, 22L)).toDF("k", "v"),
      append = true)
    assert(VersionedTable.read(spark, t).count() == 11)
    intercept[IllegalArgumentException] {
      VersionedTable.requireFeature(spark, t, "time-crystals")
    }
    intercept[IllegalArgumentException] { // bad name
      VersionedTable.requireFeature(spark, t, "no spaces")
    }
  }

  test("pre-protocol tables (no _protocol file) are unaffected") {
    val t = fresh("vprn")
    seed(t)
    assert(VersionedTable.protocolOf(spark, t) ==
      (Set.empty[String], Set.empty[String]))
    VersionedTable.commit(spark, t, Seq((11L, 22L)).toDF("k", "v"),
      append = true)
    assert(VersionedTable.read(spark, t).count() == 11)
  }
}
