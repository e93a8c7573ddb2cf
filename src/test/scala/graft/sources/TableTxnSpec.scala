package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table atomic commit ([[TableTxn]]): N tables become visible
  * at ONE instant (the decision-file create) or not at all — proven
  * by crashing the coordinator at every protocol step and checking
  * that no reader ever sees one side only. */
class TableTxnSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (String, String) = {
    val root = Files.createTempDirectory("vtxn").toString
    (root + "/fact", root + "/dim")
  }

  private def seed(fact: String, dim: String): Unit = {
    VersionedTable.commit(spark, fact,
      (1L to 50L).map(i => (i, i * 10)).toDF("k", "amount"),
      append = false)
    VersionedTable.commit(spark, dim,
      (1L to 5L).map(i => (i, s"g$i")).toDF("k", "grp"), append = false)
  }

  private def counts(fact: String, dim: String): (Long, Long) =
    (VersionedTable.read(spark, fact).count(),
      VersionedTable.read(spark, dim).count())

  private def txn(fact: String, dim: String) = Seq(
    TableTxn.TxnWrite(fact,
      Seq((100L, 999L)).toDF("k", "amount"), append = true),
    TableTxn.TxnWrite(dim,
      Seq((100L, "gX")).toDF("k", "grp"), append = true))

  test("a clean transaction moves both tables together; each table's " +
    "commit carries the shared txn id") {
    val (fact, dim) = fresh()
    seed(fact, dim)
    val vs = TableTxn.commitAll(spark, txn(fact, dim))
    assert(vs == Map(fact -> 2, dim -> 2))
    assert(counts(fact, dim) == ((51L, 6L)))
    val t1 = VersionedTable.metaOf(
      VersionedTable.manifest(spark, fact, 2))("txn")
    val t2 = VersionedTable.metaOf(
      VersionedTable.manifest(spark, dim, 2))("txn")
    assert(t1 == t2 && t1.nonEmpty)
    // markers sealed: no residue in either manifest dir
    Seq(fact, dim).foreach { t =>
      val dir = new org.apache.hadoop.fs.Path(t, "_manifests")
      val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!f.listStatus(dir).exists(
        _.getPath.getName.contains(".pending.")))
    }
  }

  test("a coordinator crash at EVERY pre-decision step leaves " +
    "neither side visible; resolve_pending frees the slots; a later " +
    "transaction succeeds") {
    for (crashAt <- Seq("staged:", "marked:", "published:")) {
      val (fact, dim) = fresh()
      seed(fact, dim)
      // crash on the FIRST firing of the chosen step (table order is
      // the writes order, so this is mid-transaction, one side done)
      TableTxn.failpoint = label =>
        if (label.startsWith(crashAt))
          throw new TableTxn.SimulatedCrash(s"crash at $label")
      try intercept[Exception] { TableTxn.commitAll(spark, txn(fact, dim)) }
      finally TableTxn.failpoint = _ => ()
      assert(counts(fact, dim) == ((50L, 5L)),
        s"crash at $crashAt must leave BOTH tables at the old state")
      // the janitor resolves whatever residue the crash left
      TableTxn.resolvePending(spark, fact)
      TableTxn.resolvePending(spark, dim)
      assert(counts(fact, dim) == ((50L, 5L)))
      // and the system is live again: a fresh txn commits both sides
      TableTxn.commitAll(spark, txn(fact, dim))
      assert(counts(fact, dim) == ((51L, 6L)),
        s"after resolving a $crashAt crash the next txn must commit")
    }
  }

  test("a crash BETWEEN publishing the two manifests is the razor's " +
    "edge: first table published, second not — still invisible, " +
    "still recoverable") {
    val (fact, dim) = fresh()
    seed(fact, dim)
    TableTxn.failpoint = label =>
      if (label == s"published:$fact")
        throw new TableTxn.SimulatedCrash("crash mid-publish")
    try intercept[Exception] { TableTxn.commitAll(spark, txn(fact, dim)) }
    finally TableTxn.failpoint = _ => ()
    // fact's v2 manifest EXISTS on disk but is txn-marked undecided:
    // readers must not see it
    val f = new org.apache.hadoop.fs.Path(fact).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(fact,
      "_manifests/v00000002.json")), "the manifest was published")
    assert(VersionedTable.versions(spark, fact) == Seq(1),
      "an undecided txn version must be invisible")
    assert(counts(fact, dim) == ((50L, 5L)))
    // resolve: the in-flight txn aborts, the slot frees
    val acts = TableTxn.resolvePending(spark, fact)
    assert(acts.exists(_.startsWith("aborted")), acts.toString)
    // a plain single-table commit takes the freed slot
    VersionedTable.commit(spark, fact,
      Seq((200L, 1L)).toDF("k", "amount"), append = true)
    assert(counts(fact, dim) == ((51L, 5L)))
  }

  test("a crash AFTER the decision but BEFORE sealing: both sides " +
    "are already visible (the decision IS the commit point)") {
    val (fact, dim) = fresh()
    seed(fact, dim)
    TableTxn.failpoint = label =>
      if (label == "decided")
        throw new TableTxn.SimulatedCrash("crash before seal")
    try intercept[Exception] { TableTxn.commitAll(spark, txn(fact, dim)) }
    finally TableTxn.failpoint = _ => ()
    assert(counts(fact, dim) == ((51L, 6L)),
      "a decided txn is committed even if sealing never ran")
    // the janitor seals the committed markers instead of aborting
    val acts = TableTxn.resolvePending(spark, fact) ++
      TableTxn.resolvePending(spark, dim)
    assert(acts.nonEmpty && acts.forall(_.startsWith("sealed")), acts)
    assert(counts(fact, dim) == ((51L, 6L)))
  }

  test("an orphan sweep never eats an in-flight txn's staged data; " +
    "after resolution the aborted residue is reclaimed") {
    val (fact, dim) = fresh()
    seed(fact, dim)
    TableTxn.failpoint = label =>
      if (label == s"published:$fact")
        throw new TableTxn.SimulatedCrash("crash mid-publish")
    try intercept[Exception] { TableTxn.commitAll(spark, txn(fact, dim)) }
    finally TableTxn.failpoint = _ => ()
    val f = new org.apache.hadoop.fs.Path(fact).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val pendingData = VersionedTable.dataFilesOf(
      VersionedTable.manifest(spark, fact, 2))
      .filter(_.contains("/data/2-"))
    assert(pendingData.nonEmpty)
    // sweep with a future cutoff while the txn is UNDECIDED: the
    // marker-pended version's files must be protected
    VersionedTable.cleanOrphans(spark, fact, olderThanMs = -600000L)
    pendingData.foreach(p => assert(
      f.exists(new org.apache.hadoop.fs.Path(p)),
      s"an in-flight txn's staged file must survive the sweep: $p"))
    // resolve (aborts) → the next sweep reclaims data AND the
    // renamed-aside manifest
    TableTxn.resolvePending(spark, fact)
    val swept = VersionedTable.cleanOrphans(spark, fact,
      olderThanMs = -600000L)
    pendingData.foreach(p => assert(
      !f.exists(new org.apache.hadoop.fs.Path(p)),
      s"aborted staged data must reclaim: $p"))
    assert(swept.exists(_.contains(".json.aborted.")), swept.toString)
    assert(VersionedTable.read(spark, fact).count() == 50L)
  }

  test("guards: duplicate tables refuse; a failed stage discards " +
    "cleanly; CALL resolve_txns works through the catalog") {
    val (fact, dim) = fresh()
    seed(fact, dim)
    intercept[IllegalArgumentException] {
      TableTxn.commitAll(spark, Seq(
        TableTxn.TxnWrite(fact, Seq((1L, 1L)).toDF("k", "amount"),
          append = true),
        TableTxn.TxnWrite(fact, Seq((2L, 2L)).toDF("k", "amount"),
          append = true)))
    }
    val w = Files.createTempDirectory("vtxn_cat").toString
    spark.conf.set("spark.sql.catalog.gtx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtx.warehouse", w)
    (1L to 5L).map(i => (i, i)).toDF("k", "v")
      .createOrReplaceTempView("txn_src")
    spark.sql("CREATE TABLE gtx.t AS SELECT * FROM txn_src")
    assert(spark.sql("CALL gtx.system.resolve_txns('t')")
      .collect().isEmpty, "a clean table has nothing to resolve")
  }
}
