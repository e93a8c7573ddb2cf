package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-anchor file skipping ([[VersionedTable.textIndexBuild]] /
  * `textIndexCandidates` / `decontaminateExactTable`): a persisted
  * per-file Bloom over window rolling hashes prunes FILES before the
  * rolling decontamination pass — with the zero-false-negative
  * contract held across appends, short snippets, and rebuilds. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vtextidx").toString + "/t"

  private def mk(i: Long): String =
    s"document $i body " + (1 to 40)
      .map(j => s"w${(i * 131 + j * 7) % 9973}").mkString(" ")

  private val planted =
    "the planted benchmark passage nine thousand one hundred and seven"

  test("index prunes to the contaminated file; answers row-identical " +
    "to the unpruned screen; un-indexed NEW files always scan") {
    val t = freshTable()
    // 4 range-partitioned files; the planted snippet lives in doc 10
    // (file 1 of 4)
    val docs = (1L to 400L).map(i =>
      (i, mk(i) + (if (i == 10L) " " + planted else "")))
      .toDF("doc_id", "text")
    VersionedTable.commit(spark, t,
      docs.repartitionByRange(4, col("doc_id")),
      append = false, statCols = Seq("doc_id"))
    VersionedTable.textIndexBuild(spark, t, "text")
    val bench = Seq((100L, planted),
      (101L, "this exact sentence appears in no corpus document " +
        "anywhere at all, however hard anyone looks for it"))
      .toDF("bench_id", "snippet")
    var pruned = (-1, -1)
    VersionedTable.textIndexPruneNotifier = (c, n) => pruned = (c, n)
    try {
      val got = VersionedTable.decontaminateExactTable(spark, t,
        "doc_id", "text", bench, "bench_id", "snippet")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 1L), got.toString)
      assert(pruned._2 == 4 && pruned._1 < 4 && pruned._1 >= 1,
        s"the index must prune the 4-file scan: $pruned")
      // a file appended AFTER the build is un-indexed: always scanned
      VersionedTable.commit(spark, t,
        Seq((999L, mk(999L) + " " + planted)).toDF("doc_id", "text"),
        append = true)
      val got2 = VersionedTable.decontaminateExactTable(spark, t,
        "doc_id", "text", bench, "bench_id", "snippet")
        .as[(Long, Long)].collect().toMap
      assert(got2 == Map(10L -> 1L, 999L -> 1L),
        s"new files must stay candidates until a rebuild: $got2")
      // rebuild covers the new file and re-prunes
      val prev = VersionedTable.textIndexBuild(spark, t, "text")
      val got3 = VersionedTable.decontaminateExactTable(spark, t,
        "doc_id", "text", bench, "bench_id", "snippet")
        .as[(Long, Long)].collect().toMap
      assert(got3 == got2)
      assert(pruned._1 < pruned._2, s"rebuilt index must prune: $pruned")
      assert(new org.apache.hadoop.fs.Path(prev).getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(
        new org.apache.hadoop.fs.Path(prev)))
    } finally VersionedTable.textIndexPruneNotifier = (_, _) => ()
  }

  test("index lifecycle: drop removes property + sidecar; a crashed " +
    "build's orphan sidecar is reclaimed by cleanOrphans") {
    val t = freshTable()
    VersionedTable.commit(spark, t,
      (1L to 50L).map(i => (i, mk(i))).toDF("doc_id", "text"),
      append = false)
    val sidecar = VersionedTable.textIndexBuild(spark, t, "text")
    val f = new org.apache.hadoop.fs.Path(sidecar).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crashed rebuild: a sidecar dir with no property
    val orphan = new org.apache.hadoop.fs.Path(t, "_index/text_text_dead")
    f.mkdirs(orphan)
    assert(VersionedTable.cleanOrphans(spark, t, 0L)
      .exists(_.contains("text_text_dead")),
      "the orphan sweep must reclaim crashed index residue")
    assert(f.exists(new org.apache.hadoop.fs.Path(sidecar)),
      "the LIVE (property-referenced) sidecar must survive the sweep")
    VersionedTable.textIndexDrop(spark, t, "text")
    assert(!f.exists(new org.apache.hadoop.fs.Path(sidecar)))
    assert(VersionedTable.textIndexCandidates(spark, t, "text",
      Seq("x" * 80)).isEmpty, "no index after the drop")
    VersionedTable.textIndexDrop(spark, t, "text") // idempotent
  }

  test("the probe plan is distributed: single `file` column out (the " +
    "driver never sees index cells), broadcast joins throughout") {
    val t = freshTable()
    val docs = (1L to 200L).map(i =>
      (i, mk(i) + (if (i == 42L) " " + planted else "")))
      .toDF("doc_id", "text")
    VersionedTable.commit(spark, t,
      docs.repartitionByRange(4, col("doc_id")),
      append = false, statCols = Seq("doc_id"))
    val sidecar = VersionedTable.textIndexBuild(spark, t, "text")
    val idx = spark.read.parquet(sidecar)
    val anchors = Seq(graft.plans.Kernels.windowHash(planted, 64))
    val hitDf = VersionedTable.textIndexHitFiles(
      spark, idx, anchors, bitsLog2 = 20, k = 4)
    assert(hitDf.columns.toSeq == Seq("file"),
      "only file paths may come back to the driver: " +
        hitDf.columns.mkString(","))
    val hits = hitDf.collect().map(_.getString(0)).toSet
    val all = idx.select("file").distinct().count()
    assert(all == 4L, s"4 indexed files expected, got $all")
    assert(hits.nonEmpty && hits.size < 4,
      s"the planted file must hit without dragging the estate: $hits")
    val plan = hitDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"),
      s"the tiny probe table must broadcast, never shuffle the index:\n" +
        plan.take(2000))
    // a nowhere-anchor hits nothing
    assert(VersionedTable.textIndexHitFiles(spark, idx,
      Seq(graft.plans.Kernels.windowHash("z" * 64, 64)),
      bitsLog2 = 20, k = 4).count() == 0L)
  }

  test("a rebuild leaves the superseded sidecar for concurrent " +
    "readers; cleanOrphans reclaims it once unreferenced") {
    val t = freshTable()
    VersionedTable.commit(spark, t,
      (1L to 60L).map(i => (i, mk(i))).toDF("doc_id", "text"),
      append = false)
    val first = VersionedTable.textIndexBuild(spark, t, "text")
    val f = new org.apache.hadoop.fs.Path(first).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a concurrent query resolved the OLD property value before the
    // rebuild: its probe must still find the sidecar afterwards
    val oldIdx = spark.read.parquet(first)
    val second = VersionedTable.textIndexBuild(spark, t, "text")
    assert(first != second)
    assert(f.exists(new org.apache.hadoop.fs.Path(first)),
      "the superseded sidecar must survive until the orphan sweep")
    assert(oldIdx.count() > 0L, "the in-flight reader must not break")
    // unreferenced now → the sweep reclaims it (and keeps the live one)
    val swept = VersionedTable.cleanOrphans(spark, t, 0L)
    assert(swept.exists(_.contains(
      new org.apache.hadoop.fs.Path(first).getName)), swept.toString)
    assert(!f.exists(new org.apache.hadoop.fs.Path(first)))
    assert(f.exists(new org.apache.hadoop.fs.Path(second)))
  }

  test("textIndexRefresh extends coverage to new files in place — " +
    "same sidecar, one pass over the appendees, pruning restored") {
    val t = freshTable()
    VersionedTable.commit(spark, t,
      (1L to 200L).map(i => (i, mk(i))).toDF("doc_id", "text")
        .repartitionByRange(4, col("doc_id")),
      append = false, statCols = Seq("doc_id"))
    val sidecar = VersionedTable.textIndexBuild(spark, t, "text")
    val planted2 = "an entirely different smoking-gun passage of " +
      "sixty-plus characters planted later"
    VersionedTable.commit(spark, t,
      Seq((900L, mk(900L) + " " + planted2)).toDF("doc_id", "text"),
      append = true)
    VersionedTable.commit(spark, t,
      Seq((901L, mk(901L))).toDF("doc_id", "text"), append = true)
    assert(VersionedTable.textIndexRefresh(spark, t, "text") == 2)
    assert(VersionedTable.textIndexRefresh(spark, t, "text") == 0,
      "a second refresh has nothing to cover")
    // the property still points at the SAME sidecar (no rebuild)
    assert(VersionedTable.textIndexCandidates(spark, t, "text",
      Seq(planted2)).isDefined)
    var pruned = (-1, -1)
    VersionedTable.textIndexPruneNotifier = (c, n) => pruned = (c, n)
    try {
      val cand = VersionedTable.textIndexCandidates(spark, t, "text",
        Seq(planted2)).get
      assert(pruned._2 == 6 && cand.size <= 2,
        s"the refreshed index must prune the 6-file estate to the " +
          s"planted file: $pruned, kept ${cand.size}")
      assert(new org.apache.hadoop.fs.Path(sidecar).getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(
        new org.apache.hadoop.fs.Path(sidecar)),
        "refresh appends to the existing sidecar")
    } finally VersionedTable.textIndexPruneNotifier = (_, _) => ()
  }

  test("maintain rebuilds a churned index when the declared threshold " +
    "is crossed — and leaves a fresh one alone (pruning restored)") {
    val t = freshTable()
    VersionedTable.commit(spark, t,
      (1L to 200L).map(i => (i, mk(i) + (if (i == 9L) " " + planted else "")))
        .toDF("doc_id", "text")
        .repartitionByRange(4, col("doc_id")),
      append = false, statCols = Seq("doc_id"))
    VersionedTable.textIndexBuild(spark, t, "text")
    VersionedTable.setTableProperty(spark, t,
      VersionedTable.IndexRebuildProp, "0.4")
    // below threshold: 1 of 5 files un-indexed — no rebuild
    VersionedTable.commit(spark, t,
      Seq((901L, mk(901L))).toDF("doc_id", "text"), append = true)
    assert(!VersionedTable.maintain(spark, t, 1000000L,
      maxSmallFiles = 1000)
      .exists(_.kind == "reindex-text"),
      "1/5 un-indexed is under the 0.4 threshold")
    // churn past it: 4 of 8 files un-indexed — maintain rebuilds
    (902L to 904L).foreach { i =>
      VersionedTable.commit(spark, t,
        Seq((i, mk(i))).toDF("doc_id", "text"), append = true)
    }
    val acts = VersionedTable.maintain(spark, t, 1000000L,
      maxSmallFiles = 1000)
    assert(acts.exists(_.kind == "reindex-text"), acts.toString)
    // the rebuilt index covers everything again: full pruning back
    var pruned = (-1, -1)
    VersionedTable.textIndexPruneNotifier = (c, n) => pruned = (c, n)
    try {
      VersionedTable.textIndexCandidates(spark, t, "text",
        Seq("y" * 80)).get
      assert(pruned._2 == 8 && pruned._1 <= 1,
        s"a nowhere-probe must prune the rebuilt estate: $pruned")
    } finally VersionedTable.textIndexPruneNotifier = (_, _) => ()
  }

  test("CALL gti.system.build_text_index / drop_text_index drive the " +
    "lifecycle from SQL") {
    val w = Files.createTempDirectory("textidx_cat").toString
    spark.conf.set("spark.sql.catalog.gti", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gti.warehouse", w)
    (1L to 50L).map(i => (i, mk(i))).toDF("doc_id", "text")
      .createOrReplaceTempView("ti_src")
    spark.sql("CREATE TABLE gti.d AS SELECT * FROM ti_src")
    val side = spark.sql(
      "CALL gti.system.build_text_index('d', 'text')")
      .collect().head.getString(0)
    assert(side.contains("_index/text_text_"), side)
    assert(VersionedTable.textIndexCandidates(spark, s"$w/d", "text",
      Seq("z" * 80)).isDefined, "the built index must be usable")
    assert(spark.sql("CALL gti.system.drop_text_index('d', 'text')")
      .collect().head.getBoolean(0))
    assert(VersionedTable.textIndexCandidates(spark, s"$w/d", "text",
      Seq("z" * 80)).isEmpty)
  }

  test("a snippet shorter than the indexed window disables the index " +
    "(full scan) without losing correctness; no index = full scan") {
    val t = freshTable()
    val docs = (1L to 100L).map(i =>
      (i, mk(i) + (if (i == 7L) " needle-xyz" else "")))
      .toDF("doc_id", "text")
    VersionedTable.commit(spark, t,
      docs.repartitionByRange(2, col("doc_id")),
      append = false, statCols = Seq("doc_id"))
    val bench = Seq((1L, "needle-xyz")).toDF("bench_id", "snippet")
    // no index yet: plain full-scan path
    assert(VersionedTable.decontaminateExactTable(spark, t,
      "doc_id", "text", bench, "bench_id", "snippet")
      .as[(Long, Long)].collect().toMap == Map(7L -> 1L))
    VersionedTable.textIndexBuild(spark, t, "text") // w = 64 > 10
    var fired = false
    VersionedTable.textIndexPruneNotifier = (_, _) => fired = true
    try {
      assert(VersionedTable.decontaminateExactTable(spark, t,
        "doc_id", "text", bench, "bench_id", "snippet")
        .as[(Long, Long)].collect().toMap == Map(7L -> 1L))
      assert(!fired,
        "a sub-window snippet must bypass the index, not misuse it")
    } finally VersionedTable.textIndexPruneNotifier = (_, _) => ()
  }
}
