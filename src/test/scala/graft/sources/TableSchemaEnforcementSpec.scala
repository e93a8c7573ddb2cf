package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-time schema enforcement: appends may ADD columns (evolution)
  * but never change an existing column's type — the conflict is
  * rejected at the writer, files unstaged, instead of breaking every
  * later merged-schema read. Overwrites start a fresh lineage and may
  * reshape freely. */
class TableSchemaEnforcementSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("tschema").toString + "/t"

  private def dataFileCount(t: String): Long = {
    val p = new org.apache.hadoop.fs.Path(t, "data")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return 0L
    val it = f.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  test("append with a type conflict is rejected and unstaged") {
    val t = fresh()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    val before = dataFileCount(t)
    val e = intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq(("not-a-long", "b")).toDF("k", "v"), append = true)
    }
    assert(e.getMessage.contains("schema conflict") &&
      e.getMessage.contains("k:"))
    assert(VersionedTable.versions(spark, t) == Seq(1), "head unchanged")
    assert(dataFileCount(t) == before, "staged files must be unstaged")
    // and the table still reads
    assert(VersionedTable.read(spark, t).count() == 1L)
  }

  test("adding a new column is evolution; the cached schema merges") {
    val t = fresh()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t,
      Seq((2L, "b", 9.5)).toDF("k", "v", "score"), append = true)
    val sch = VersionedTable.tableSchemaOf(spark, t).get
    assert(sch.fieldNames.toSet == Set("k", "v", "score"))
    assert(VersionedTable.read(spark, t)
      .filter(col("score").isNull).count() == 1L)
    // a later append conflicting with the EVOLVED column also rejects
    intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq((3L, "c", "high")).toDF("k", "v", "score"), append = true)
    }
  }

  test("MERGE with a new source column evolves the cached schema too") {
    val t = fresh()
    VersionedTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), append = false,
      statCols = Seq("k"))
    // upsert k=2 and insert k=3, both carrying a NEW column
    VersionedTable.mergeCommit(spark, t,
      Seq((2L, "B", 7.5), (3L, "c", 1.5)).toDF("k", "v", "score"), "k")
    val sch = VersionedTable.tableSchemaOf(spark, t).get
    assert(sch.fieldNames.toSet == Set("k", "v", "score"),
      "the sc line must merge the evolved column, not carry stale")
    // untouched rows surface the column as NULL
    val rows = VersionedTable.read(spark, t)
      .select("k", "v", "score").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "B", Some(7.5)),
      (3L, "c", Some(1.5))))
    // a later writer conflicting with the MERGE-evolved column rejects
    // — the stale-schema hazard this guards against
    intercept[IllegalStateException] {
      VersionedTable.commit(spark, t,
        Seq((4L, "d", "high")).toDF("k", "v", "score"), append = true)
    }
  }

  test("an overwrite may reshape the schema (fresh lineage)") {
    val t = fresh()
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, t, Seq(("now-a-string", 7L)).toDF("k", "n"),
      append = false)
    assert(VersionedTable.tableSchemaOf(spark, t).get
      .fields.map(f => f.name -> f.dataType.catalogString).toMap
      == Map("k" -> "string", "n" -> "bigint"))
    // old version still time-travels with its own schema
    assert(VersionedTable.read(spark, t, Some(1)).columns.toSeq
      == Seq("k", "v"))
  }

  test("partitioned append and commitWithRetry enforce too") {
    val t = fresh()
    VersionedTable.commitPartitioned(spark, t,
      Seq((1L, "g1")).toDF("k", "g"), "g", append = false)
    intercept[IllegalStateException] {
      VersionedTable.commitPartitioned(spark, t,
        Seq(("bad", "g2")).toDF("k", "g"), "g", append = true)
    }
    intercept[IllegalStateException] {
      VersionedTable.commitWithRetry(spark, t,
        Seq(("bad", "g3")).toDF("k", "g"), append = true)
    }
    assert(VersionedTable.versions(spark, t) == Seq(1))
  }

  test("commitWithRetry now enforces CHECK constraints as well") {
    val t = fresh()
    VersionedTable.commit(spark, t, Seq((1L, 10L)).toDF("k", "x"),
      append = false)
    VersionedTable.addConstraint(spark, t, "x_pos", "x > 0")
    val e = intercept[IllegalStateException] {
      VersionedTable.commitWithRetry(spark, t,
        Seq((2L, -5L)).toDF("k", "x"), append = true)
    }
    assert(e.getMessage.contains("x_pos"))
    assert(VersionedTable.versions(spark, t) == Seq(1))
    assert(VersionedTable.read(spark, t).count() == 1L)
  }

  test("adopt publish rejects a schema conflict and restores staging") {
    val target = fresh(); val staging = fresh()
    VersionedTable.commit(spark, target, Seq((1L, "a")).toDF("k", "v"),
      append = false)
    VersionedTable.commit(spark, staging,
      Seq(("bad-type", "b")).toDF("k", "v"), append = false)
    val stagedBefore = dataFileCount(staging)
    val e = intercept[IllegalStateException] {
      VersionedTable.adoptCommit(spark, target, staging, append = true)
    }
    assert(e.getMessage.contains("schema conflict"))
    assert(dataFileCount(staging) == stagedBefore,
      "rejected adopt must move the files back")
    assert(VersionedTable.read(spark, staging).count() == 1L)
    assert(VersionedTable.versions(spark, target) == Seq(1))
  }
}
