package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-time CHECK constraints on [[VersionedTable]]. */
class TableConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("vtable_check").toString + "/t"

  test("violating append is rejected, head unchanged, files unstaged") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    val e = intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq((3L, -5L)).toDF("k", "x"), append = true)
    }
    assert(e.getMessage.contains("x_pos"))
    assert(VersionedTable.versions(spark, t) == Seq(1))
    assert(VersionedTable.cleanOrphans(spark, t, olderThanMs = -600000L)
      .isEmpty, "rejected commit must leave no staged files behind")
    // a valid append still goes through
    VersionedTable.commit(spark, t, Seq((3L, 5L)).toDF("k", "x"),
      append = true)
    assert(VersionedTable.read(spark, t).count() == 3L)
  }

  test("NULL passes (ANSI CHECK semantics); FALSE fails") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      Seq((1L, Some(10L))).toDF("k", "x"), append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    VersionedTable.commit(spark, t,
      Seq((2L, Option.empty[Long])).toDF("k", "x"), append = true)
    assert(VersionedTable.read(spark, t).count() == 2L)
    intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq((3L, Some(0L))).toDF("k", "x"), append = true)
    }
  }

  test("adding a constraint the current snapshot violates is rejected") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      Seq((1L, -1L)).toDF("k", "x"), append = false)
    intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    }
    assert(VersionedTable.constraintsOf(spark, t).isEmpty)
  }

  test("merge: violating update rejected atomically; valid update passes") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "x")
        .repartitionByRange(4, col("k")), append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    intercept[IllegalStateException] {
      VersionedTable.mergeCommit(spark, t,
        Seq((5L, -50L)).toDF("k", "x"), "k")
    }
    assert(VersionedTable.versions(spark, t) == Seq(1))
    assert(VersionedTable.read(spark, t)
      .filter(col("k") === 5L).select(col("x")).as[Long].head() == 50L)
    VersionedTable.mergeCommit(spark, t, Seq((5L, 555L)).toDF("k", "x"), "k")
    assert(VersionedTable.read(spark, t)
      .filter(col("k") === 5L).select(col("x")).as[Long].head() == 555L)
  }

  test("partitioned commit and dynamic overwrite validate too") {
    val t = fresh()
    VersionedTable.commitPartitioned(spark, t,
      Seq((1L, "a", 10L)).toDF("k", "g", "x"), "g", append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    intercept[IllegalStateException] {
      VersionedTable.commitPartitioned(spark, t,
        Seq((2L, "b", -1L)).toDF("k", "g", "x"), "g", append = true)
    }
    intercept[IllegalStateException] {
      VersionedTable.dynamicOverwrite(spark, t,
        Seq((3L, "a", -7L)).toDF("k", "g", "x"), "g")
    }
    assert(VersionedTable.versions(spark, t) == Seq(1))
    assert(VersionedTable.cleanOrphans(spark, t, olderThanMs = -600000L)
      .isEmpty)
    VersionedTable.dynamicOverwrite(spark, t,
      Seq((3L, "a", 7L)).toDF("k", "g", "x"), "g")
    assert(VersionedTable.read(spark, t).select(col("k"))
      .as[Long].collect().toSet == Set(3L))
  }

  test("multiple constraints: the failing one is named; drop re-admits") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      Seq((1L, "ok", 10L)).toDF("k", "s", "x"), append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    VersionedTable.addConstraint(spark, t, "s_short", "length(s) <= 4")
    assert(VersionedTable.constraintsOf(spark, t).keySet ==
      Set("x_pos", "s_short"))
    val e = intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq((2L, "toolong", 5L)).toDF("k", "s", "x"), append = true)
    }
    assert(e.getMessage.contains("s_short") &&
      !e.getMessage.contains("x_pos ("))
    VersionedTable.dropConstraint(spark, t, "s_short")
    VersionedTable.commit(spark, t,
      Seq((2L, "toolong", 5L)).toDF("k", "s", "x"), append = true)
    assert(VersionedTable.read(spark, t).count() == 2L)
    // duplicate add is refused, not silently replaced
    intercept[Exception] {
      VersionedTable.addConstraint(spark, t, "x_pos", "x > 100")
    }
    assert(VersionedTable.constraintsOf(spark, t)("x_pos") == "x > 0")
  }
}
