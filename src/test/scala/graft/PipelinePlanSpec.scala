package graft

/** Physical-plan shape pins for the pipeline tier — the scale claims in
  * the operators' docs, asserted so a refactor cannot silently add a
  * shuffle: narrow signals stay narrow (zero shuffle exchanges),
  * per-key window ops shuffle exactly once, and decontamination's eval
  * side rides a broadcast.
  */
class PipelinePlanSpec extends SparkSpec {

  private def shapes(name: String): (Int, Int) = {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange (hash|range|roundrobin|Single)".r
      .findAllIn(plan).length
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    (shuffles, broadcasts)
  }

  test("narrow signal queries plan zero shuffle exchanges") {
    for (q <- Seq("q_quality_rules", "q_repetition", "q_pii_redact",
        "q_chunk_docs")) {
      val (shuffles, _) = shapes(q)
      assert(shuffles == 0, s"$q planned $shuffles shuffle exchange(s)")
    }
  }

  test("per-key window operators shuffle exactly once") {
    for (q <- Seq("q_pack_sequences", "q_cdc_merge", "q_scd2",
        "q_window_funcs")) {
      val (shuffles, _) = shapes(q)
      assert(shuffles == 1, s"$q planned $shuffles shuffle exchange(s)")
    }
  }

  test("decontamination broadcasts the eval shingle side") {
    val (_, broadcasts) = shapes("q_decontaminate")
    assert(broadcasts >= 1, "eval shingles must ride a BroadcastExchange")
  }

  test("epoch shards: one hash exchange, no total sort") {
    val (shuffles, _) = shapes("q_epoch_shards")
    assert(shuffles == 1, s"epoch shuffle must cost exactly one " +
      s"exchange (hash by shard + per-reducer sort), planned $shuffles")
  }
}
