package graft

/** Every gate query must be a pure function of its input tables: two
  * runs in one session produce the identical row multiset. Guards
  * against nondeterminism sneaking into an operator (unordered
  * dropDuplicates survivors, tie-less rankings, partition-dependent
  * sampling) — the exact failure mode that breaks the cross-engine
  * hash gate one round later. Runs at sf0.001 to keep the suite fast
  * and doubles as a smoke test that every query executes at the
  * smallest scale factor.
  */
class DeterminismSpec extends SparkSpec {

  private val smokeDir = "/root/testdata/sf0.001"

  // memory-sink streaming queries register a fixed queryName per call;
  // QueriesML handles reuse internally, so they are safe to re-run
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is deterministic at sf0.001") {
      def multiset() = fn(spark, smokeDir).collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val first = multiset()
      assert(first.nonEmpty, "smoke: query must return rows")
      assert(multiset() == first, "second run differed")
    }
  }
}
