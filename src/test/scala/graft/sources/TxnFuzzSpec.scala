package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized multi-table transaction histories ([[TableTxn]]) vs a
  * serial in-memory oracle: a seeded RNG drives clean transactions,
  * coordinator crashes at random protocol steps, janitor cycles, and
  * interleaved plain single-table commits — after every step, every
  * table's (count, sum) must equal the oracle's, i.e. a transaction
  * is all-in (decision reached) or all-out (crash before decision),
  * never split across tables. */
class TxnFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val NTables = 3
  private val OpsPerSeed = 8

  test("random txn/crash/janitor histories: every table always " +
    "matches the serial oracle (3 seeds x 8 ops)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed * 7919)
      val root = Files.createTempDirectory(s"vtxnfuzz$seed").toString
      val tables = (0 until NTables).map(i => s"$root/t$i")
      // oracle: per-table (rows, sum)
      val oracle = Array.fill(NTables)((0L, 0L))
      def slice(): (Seq[(Long, Long)], Long) = {
        val n = 1 + rnd.nextInt(20)
        val rows = (1 to n).map(_ =>
          (rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong))
        (rows, rows.map(_._2).sum)
      }
      // seed every table
      tables.indices.foreach { i =>
        val (rows, sum) = slice()
        VersionedTable.commit(spark, tables(i),
          rows.toDF("k", "v"), append = false)
        oracle(i) = (rows.size.toLong, sum)
      }
      def check(ctx: String): Unit = tables.indices.foreach { i =>
        val got = VersionedTable.read(spark, tables(i))
          .agg(count(lit(1)), coalesce(sum(col("v")), lit(0L)))
          .collect()(0)
        assert((got.getLong(0), got.getLong(1)) == oracle(i),
          s"seed=$seed $ctx table=$i: got " +
            s"(${got.getLong(0)},${got.getLong(1)}) vs ${oracle(i)}")
      }
      check("after seed")

      for (op <- 1 to OpsPerSeed) {
        rnd.nextInt(4) match {
          case 0 => // plain single-table commit
            val i = rnd.nextInt(NTables)
            val (rows, sum) = slice()
            VersionedTable.commit(spark, tables(i),
              rows.toDF("k", "v"), append = true)
            oracle(i) = (oracle(i)._1 + rows.size, oracle(i)._2 + sum)
          case 1 => // clean multi-table txn
            val parts = rnd.shuffle(tables.indices.toList)
              .take(2 + rnd.nextInt(NTables - 1))
            val writes = parts.map { i =>
              val (rows, sum) = slice()
              oracle(i) = (oracle(i)._1 + rows.size, oracle(i)._2 + sum)
              TableTxn.TxnWrite(tables(i), rows.toDF("k", "v"),
                append = true)
            }
            TableTxn.commitAll(spark, writes)
          case _ => // txn with a coordinator crash at a random step
            val parts = rnd.shuffle(tables.indices.toList)
              .take(2 + rnd.nextInt(NTables - 1))
            val writes = parts.map { i =>
              TableTxn.TxnWrite(tables(i), slice()._1.toDF("k", "v"),
                append = true)
            }
            val victim = tables(parts(rnd.nextInt(parts.size)))
            val stage = Seq(s"staged:$victim", s"marked:$victim",
              s"published:$victim", "decided")(rnd.nextInt(4))
            TableTxn.failpoint = l =>
              if (l == stage) throw new TableTxn.SimulatedCrash(l)
            val committed =
              try { TableTxn.commitAll(spark, writes); true }
              catch { case _: TableTxn.SimulatedCrash =>
                stage == "decided" } // post-decision crash = committed
            TableTxn.failpoint = _ => ()
            if (committed) parts.zip(writes).foreach { case (i, w) =>
              val rows = w.df.as[(Long, Long)].collect()
              oracle(i) = (oracle(i)._1 + rows.length,
                oracle(i)._2 + rows.map(_._2).sum)
            }
            // janitor cycle frees any residue
            tables.foreach(TableTxn.resolvePending(spark, _))
        }
        check(s"op=$op")
      }
      // end of history: a sweep leaves every table still correct
      tables.foreach { t =>
        VersionedTable.cleanOrphans(spark, t, olderThanMs = -600000L)
      }
      check("after sweep")
    }
  }
}
