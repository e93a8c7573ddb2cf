package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vtable").toString + "/t"

  test("an empty (truncated) snapshot keeps the DECLARED schema — " +
    "nullability included — so scan and catalog schemas agree") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    val declared = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    VersionedTable.commit(spark, t,
      Seq((1L, "a")).toDF("k", "v"), append = false)
    VersionedTable.truncateCommit(spark, t, declared)
    val got = VersionedTable.read(spark, t).schema
    assert(got == declared,
      s"empty-snapshot schema must be the sc line as-is, got $got")
    assert(VersionedTable.read(spark, t).count() == 0L)
  }

  test("append commits accumulate; every snapshot stays readable") {
    val t = freshTable()
    val v1 = VersionedTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), append = false)
    val v2 = VersionedTable.commit(spark, t,
      Seq((3L, "c")).toDF("k", "v"), append = true)
    val v3 = VersionedTable.commit(spark, t,
      Seq((4L, "d")).toDF("k", "v"), append = true)
    assert((v1, v2, v3) == ((1, 2, 3)))
    assert(VersionedTable.versions(spark, t) == Seq(1, 2, 3))
    def keys(v: Int) = VersionedTable.read(spark, t, Some(v))
      .select("k").as[Long].collect().sorted.toSeq
    assert(keys(1) == Seq(1L, 2L))
    assert(keys(2) == Seq(1L, 2L, 3L))
    assert(keys(3) == Seq(1L, 2L, 3L, 4L))
    // default read = latest
    assert(VersionedTable.read(spark, t).count() == 4L)
  }

  test("overwrite commit starts a new lineage; old version still time-travels") {
    val t = freshTable()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t, Seq((9L, "z")).toDF("k", "v"),
      append = false)
    assert(VersionedTable.read(spark, t, Some(1))
      .select("k").as[Long].collect().toSeq == Seq(1L))
    assert(VersionedTable.read(spark, t)
      .select("k").as[Long].collect().toSeq == Seq(9L))
  }

  test("vacuum retires old versions and their unreferenced data files only") {
    val t = freshTable()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      append = true)
    VersionedTable.commit(spark, t, Seq((9L, "z")).toDF("k", "v"),
      append = false) // v3 references ONLY its own files
    VersionedTable.vacuum(spark, t, keepLast = 1)
    assert(VersionedTable.versions(spark, t) == Seq(3))
    assert(VersionedTable.read(spark, t)
      .select("k").as[Long].collect().toSeq == Seq(9L))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, t, Some(1))
    }
    // v1/v2 data dirs lost their parquet files
    val dataRoot = new java.io.File(s"$t/data")
    val remaining = dataRoot.listFiles().flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(remaining.nonEmpty &&
      remaining.forall(_.getParentFile.getName.startsWith("3-")))
  }

  test("vacuum keeps shared files referenced by surviving append versions") {
    val t = freshTable()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      append = true) // v2 carries v1's files forward
    VersionedTable.vacuum(spark, t, keepLast = 1)
    // v1 retired, but its files live on inside v2's manifest
    assert(VersionedTable.read(spark, t)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("mergeCommit rewrites ONLY key-range-intersecting files; carries the rest") {
    val t = freshTable()
    val base = (1L to 800L).map(i => (i, s"v$i")).toDF("k", "v")
    VersionedTable.commit(spark, t,
      base.repartitionByRange(8, col("k")), append = false)
    val m1 = VersionedTable.dataFilesOf(VersionedTable.manifest(spark, t, 1))
    assert(m1.size == 8)
    // source touches a narrow key band: updates 100..110, one insert
    val source = (100L to 110L).map(i => (i, s"UPD$i", false))
      .toDF("k", "v", "__del")
      .unionByName(Seq((9999L, "NEW", false)).toDF("k", "v", "__del"))
    val v2 = VersionedTable.mergeCommit(spark, t, source, "k",
      deleteCol = Some("__del"))
    val m2 = VersionedTable.dataFilesOf(VersionedTable.manifest(spark, t, v2))
    val carried = m2.toSet.intersect(m1.toSet)
    assert(carried.size >= 6,
      s"narrow merge must carry most of 8 clustered files, carried ${carried.size}")
    assert(carried.size < 8, "the touched file must be rewritten")
    // content equality vs the naive full merge
    val got = VersionedTable.read(spark, t)
      .as[(Long, String)].collect().sorted.toSeq
    val expect = (base.join(source.select("k"), Seq("k"), "left_anti")
      .unionByName(source.filter(!col("__del")).drop("__del")))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == expect)
    assert(got.count(_._2.startsWith("UPD")) == 11)
    assert(got.exists(_._1 == 9999L))
  }

  test("mergeCommit deletes remove keys even across carried/rewritten splits") {
    val t = freshTable()
    val base = (1L to 400L).map(i => (i, i * 10)).toDF("k", "x")
    VersionedTable.commit(spark, t,
      base.repartitionByRange(4, col("k")), append = false)
    val source = Seq((50L, 0L, true), (350L, 7777L, false))
      .toDF("k", "x", "__del")
    VersionedTable.mergeCommit(spark, t, source, "k",
      deleteCol = Some("__del"))
    val got = VersionedTable.read(spark, t)
      .as[(Long, Long)].collect().toMap
    assert(!got.contains(50L))
    assert(got(350L) == 7777L)
    assert(got.size == 399L)
    // time travel: v1 still has the deleted key
    assert(VersionedTable.read(spark, t, Some(1))
      .filter(col("k") === 50L).count() == 1L)
  }

  test("the publish primitive rejects a double-committed version number") {
    val t = freshTable()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    // the losing side of a writer race: both computed next = 1; the
    // second atomic rename onto v00000001.json must fail, loudly
    val err = intercept[RuntimeException] {
      VersionedTable.writeManifest(spark, t, 1, Seq("phantom.parquet"))
    }
    assert(err.getMessage.contains("already committed"))
    // and the winner's manifest is untouched
    assert(VersionedTable.read(spark, t, Some(1))
      .select("k").as[Long].collect().toSeq == Seq(1L))
  }
}
