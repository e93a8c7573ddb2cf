package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming over the events table.
  *
  * The reference's "incremental" mode is batch watermark re-reads
  * (SURVEY.md §2.8); the idiomatic Spark upgrade is a streaming file
  * source with `Trigger.AvailableNow` — exactly-once file listing, same
  * batch semantics, and the same code path scales to a continuous
  * micro-batch deployment with an event-time watermark.
  */
object EventStream {

  /** Schema of the events parquet as Spark reads it (either raw long
    * nanos under the legacy conf, or native TIMESTAMP_NTZ micros — see
    * graft.Tables.events for the dual-layout contract). */
  private def rawSchema(spark: SparkSession, dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema
  }

  /** `ts` as an event-time TimestampType, for either physical layout
    * (long nanos → truncate to micros; NTZ micros → plain cast, with
    * session TZ pinned UTC by every harness). */
  private def tsEvt(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts DIV 1000)")
      case _ => expr("cast(ts AS timestamp)")
    }

  /** `ts` as integer epoch-micros, for either physical layout. */
  private def tsUs(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => expr("unix_micros(cast(ts AS timestamp))")
    }

  /** Hourly event counts/volumes computed via readStream +
    * Trigger.AvailableNow into an in-memory sink; returns the final
    * batch result as a DataFrame. Event-time watermark of `delay`
    * bounds state: at scale, late data past the watermark is dropped
    * and old windows are evicted from the state store.
    *
    * `statePartitions` sizes the state store parallelism (it is
    * snapshotted from shuffle partitions at the FIRST checkpoint and
    * pinned thereafter): pick ~ state rows / desired rows-per-task. A
    * per-hour-per-type rollup holds only (hours x types) rows, so a
    * handful of partitions beats the session default — on a cluster
    * ingesting a wide keyspace, size it up instead.
    */
  /** Minimal streaming drain — pass-through projection of the events
    * source into a memory sink, NO state store, no aggregation: its
    * wall time is the fixed query-start machinery (stream planning,
    * file listing, source scan, sink collect) that EVERY streaming
    * query in this JVM pays before any operator work. [[graft.Bench]]
    * measures it as the `stream_start` floor and nets it out of
    * q_stream_* entries so operator-level regressions stay visible
    * below the floor. Returns the drained row count. */
  def startFloorProbe(spark: SparkSession, dir: String,
                      queryName: String = "stream_floor"): Long = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val q = spark.readStream.schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .select(col("event_id"))
      .writeStream.format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table(queryName).count()
    spark.catalog.dropTempView(queryName)
    n
  }

  def hourlyRollup(spark: SparkSession, dir: String,
                   delay: String = "1 hour",
                   queryName: String = "events_hourly",
                   statePartitions: Option[Int] = Some(8)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    // glob form: the file source treats a plain path as a basePath
    // directory; a glob that matches the single file works for both a
    // one-file table and a directory of parts
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts_evt", tsEvt(schema))
      .withWatermark("ts_evt", delay)
      .groupBy(window(col("ts_evt"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(graft.functions.Exact.cents(col("value"))).as("value_cents"))
      .select(
        expr("unix_timestamp(window.start) DIV 3600").as("epoch_h"),
        col("event_type"), col("cnt"), col("value_cents"))

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(queryName)
  }

  /** Stream-STATIC enrichment join + rollup: the streaming event
    * source inner-joined to a batch dimension table (customer) on
    * user_id = c_custkey, then rolled up hourly per market segment —
    * the canonical "enrich the stream with reference data" pattern.
    *
    * Unlike stream-stream joins this holds NO join state: Spark plans
    * a stream-static equi-join as a per-micro-batch join against the
    * batch side, and with `broadcast()` on the dimension it is a
    * BroadcastHashJoin inside every micro-batch — at 100 TB/day the
    * stream side never shuffles for the join; only the windowed
    * aggregation pays state. The static side is re-planned per batch,
    * so a dimension snapshot swap (new parquet) is picked up on the
    * next trigger without restarting the query. */
  def staticEnrichedRollup(spark: SparkSession, dir: String,
                           delay: String = "1 hour",
                           queryName: String = "events_enriched",
                           statePartitions: Option[Int] = Some(8)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts_evt", tsEvt(schema))
      .withWatermark("ts_evt", delay)
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts_evt"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(graft.functions.Exact.cents(col("value"))).as("value_cents"))
      .select(
        expr("unix_timestamp(window.start) DIV 3600").as("epoch_h"),
        col("c_mktsegment"), col("cnt"), col("value_cents"))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(queryName)
  }

  /** Sliding-window rollup: overlapping event-time windows (`size`
    * wide, advancing every `slide`), so each event contributes to
    * size/slide windows — the standard trailing-rate shape (e.g. "2-hour
    * request volume, refreshed hourly"). Same watermark/state-partition
    * contract as [[hourlyRollup]]; state per key-window expires once the
    * watermark passes window end, so state is bounded by
    * (size/slide) × |active keys| regardless of stream length.
    *
    * At 100 TB scale the multiplier is the cost knob: a size/slide of k
    * multiplies the shuffled aggregation rows by k. Keep k small (2-4)
    * and widen `slide` rather than `size` when the consumer tolerates
    * coarser refresh. */
  def slidingRollup(spark: SparkSession, dir: String,
                    size: String = "2 hours", slide: String = "1 hour",
                    delay: String = "1 hour",
                    queryName: String = "events_sliding",
                    statePartitions: Option[Int] = Some(8)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts_evt", tsEvt(schema))
      .withWatermark("ts_evt", delay)
      .groupBy(window(col("ts_evt"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(graft.functions.Exact.cents(col("value"))).as("value_cents"))
      .select(
        expr("unix_timestamp(window.start) DIV 3600").as("win_start_h"),
        col("event_type"), col("cnt"), col("value_cents"))

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(queryName)
  }

  /** Per-user session rollup via Spark's NATIVE `session_window` — the
    * idiomatic surface for gap-based sessions (dynamic windows that
    * merge as events arrive), complementing the explicit
    * [[sessionizeStream]] flatMapGroupsWithState variant. A session
    * window spans [first event, last event + gap); two events of one
    * user belong to one session iff consecutive gaps stay under `gapUs`
    * microseconds.
    *
    * Complete output mode (like [[hourlyRollup]]): under
    * Trigger.AvailableNow the memory sink then holds every session —
    * identical to the batch islands computation, which is what the
    * oracle checks. A 24/7 deployment switches to append mode +
    * watermark so closed sessions flush incrementally and state stays
    * bounded by open sessions only. */
  def sessionWindowRollup(spark: SparkSession, dir: String,
                          gapUs: Long = 1800L * 1000000,
                          queryName: String = "events_sessions",
                          statePartitions: Option[Int] = Some(8)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts_evt", tsEvt(schema))
      .groupBy(session_window(col("ts_evt"), s"$gapUs microseconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.Exact.cents(col("value"))).as("value_cents"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_us"),
        expr("unix_micros(session_window.end)").as("end_us"),
        col("n_events"), col("value_cents"))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(queryName)
  }

  /** Stream-stream interval self-join: each purchase joined to the same
    * user's clicks in the preceding `windowUs` microseconds — the
    * attribution-join shape. Both sides carry an event-time watermark,
    * which is what BOUNDS the join state at scale: a click older than
    * watermark + window can no longer match any future purchase and its
    * state-store entry is evicted, so state is O(arrival rate × horizon)
    * instead of O(stream length). Inner join in append mode: every
    * emitted pair is final. Split-invariance caveat: `delay` is also
    * the LATE-DATA horizon — with multi-batch input, a row arriving
    * more than `delay` behind the watermark is dropped (that is the
    * watermark contract, not a defect), so exact parity with the batch
    * join (StreamingSpec, q_stream_join's oracle) holds when input
    * arrives in order or in a single AvailableNow batch, as here. */
  def purchaseClickJoin(spark: SparkSession, dir: String,
                        queryName: String,
                        windowUs: Long = 3600L * 1000000,
                        delay: String = "1 hour",
                        statePartitions: Option[Int] = Some(8)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    def side(eventType: String, prefix: String) =
      spark.readStream
        .schema(schema)
        .parquet(s"$dir/events.parque[t]")
        .filter(col("event_type") === eventType)
        .select(col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          tsEvt(schema).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", delay)
    val joined = side("purchase", "purchase")
      .join(side("click", "click"),
        expr(s"""purchase_user = click_user
                 AND click_ts >= purchase_ts - INTERVAL ${windowUs / 1000000} SECOND
                 AND click_ts <= purchase_ts"""))
      .select(col("purchase_id"), col("click_id"),
        col("purchase_user").as("user_id"),
        expr("unix_micros(purchase_ts)").as("p_ts_us"),
        expr("unix_micros(click_ts)").as("c_ts_us"))
    // a stream-stream join runs FOUR state stores per partition (two
    // sides x key-to-value + key-to-number); at local state volume 32
    // partitions is pure store-commit overhead (same mechanism as
    // hourlyRollup's knob — partitions pin at the first checkpoint)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try {
      val query = joined.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(queryName)
  }

  /** Streaming deduplication bounded by the event-time watermark — the
    * training-pipeline "exactly-once per key" ingest shape. State holds
    * one entry per key seen within the watermark horizon (dropped once
    * the watermark passes), so memory is bounded by key arrival rate x
    * horizon, not by stream length. */
  def dedupedUsers(spark: SparkSession, dir: String,
                   delay: String = "1 hour",
                   queryName: String = "events_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts_evt", tsEvt(schema))
      .withWatermark("ts_evt", delay)
      .dropDuplicatesWithinWatermark("user_id")
      .select(col("user_id"))
    val query = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(queryName)
  }

  case class UserEvent(user_id: Long, value_cents: Long)
  case class UserTotal(user_id: Long, n_events: Long, value_cents: Long)

  case class TimedEvent(user_id: Long, ts_us: Long, value_cents: Long)
  case class SessionRow(user_id: Long, session_idx: Long, n_events: Long,
                        duration_us: Long, value_cents: Long)
  case class SessionState(nextIdx: Long, lastTs: Long)

  /** Streaming sessionization via `flatMapGroupsWithState` — the
    * one-to-many arbitrary-state shape (mapGroupsWithState is 1:1 per
    * group per batch; sessions need 0..n emissions). State per user is
    * O(1): the next session index and last-seen timestamp. Each batch
    * sorts only ITS OWN events for the user and emits session
    * FRAGMENTS: if the first event of a batch is within `gapUs` of the
    * previous batch's last event, its fragment reuses that session's
    * index, so rows sharing (user_id, session_idx) across batches
    * belong to one session and aggregate into exact per-session counts
    * and value sums (duration needs max(end)-min(start) over
    * fragments). Under Trigger.AvailableNow's single batch every
    * session is one fragment and the output matches the batch
    * lag+cumsum sessionizer (Queries.sessionize) row-for-row.
    * Assumes time-ordered arrival ACROSS batches (file-source batches
    * are ordered; out-of-order feeds need the watermark variant). A
    * 24/7 deployment can instead hold the open session in state and
    * flush complete sessions via an event-time timeout.
    */
  def sessionizeStream(spark: SparkSession, dir: String, gapUs: Long,
                       queryName: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .select(col("user_id"), tsUs(schema).as("ts_us"),
        graft.functions.Exact.cents(col("value")).as("value_cents"))
      .as[TimedEvent]
    val sessions = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(_.ts_us)
          if (evs.isEmpty) Iterator.empty
          else {
            // session_idx starts at 1 per user (same numbering as the
            // batch lag+cumsum sessionizer, whose first break flag = 1)
            val st = state.getOption.getOrElse(SessionState(1L, Long.MinValue))
            // first fragment continues the previous batch's session when
            // no gap separates them (st.nextIdx - 1 was its index)
            val continuing = st.lastTs != Long.MinValue &&
              evs.head.ts_us - st.lastTs <= gapUs
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var idx = if (continuing) st.nextIdx - 1 else st.nextIdx
            var start = 0
            var i = 1
            while (i <= evs.length) {
              if (i == evs.length || evs(i).ts_us - evs(i - 1).ts_us > gapUs) {
                out += sessionOf(user, idx, evs, start, i)
                idx += 1
                start = i
              }
              i += 1
            }
            state.update(SessionState(idx, evs.last.ts_us))
            out.iterator
          }
      }
    val query = sessions.toDF().writeStream
      .format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(queryName)
  }

  private def sessionOf(user: Long, idx: Long, evs: Array[TimedEvent],
                        from: Int, until: Int): SessionRow = {
    var cents = 0L
    var i = from
    while (i < until) { cents += evs(i).value_cents; i += 1 }
    SessionRow(user, idx, until - from,
      evs(until - 1).ts_us - evs(from).ts_us, cents)
  }

  /** Typed arbitrary-state streaming (`mapGroupsWithState`): running
    * per-user totals. The state store holds one UserTotal per user —
    * bounded by user cardinality, partitioned by the grouping key, the
    * canonical shape for per-entity rolling state at scale (add a
    * timeout to evict idle entities in a continuous deployment). */
  case class CdcRow(user_id: Long, ts_us: Long, event_id: Long,
                    event_type: String, value_cents: Long)

  /** Streaming CDC apply: the latest row per key, maintained
    * incrementally in O(1) state per key — the streaming twin of
    * [[graft.operators.ChangeCapture.applyLatest]] (same total order
    * (ts_us, event_id), same delete semantics: a key whose LATEST row
    * is a delete disappears from the result). Under a single
    * AvailableNow batch the memory sink holds exactly the batch CDC
    * result; a 24/7 deployment swaps the sink for foreachBatch MERGE
    * (update-mode emissions are per-key upserts by construction). */
  def latestPerUserStream(spark: SparkSession, dir: String,
                          queryName: String,
                          deleteType: String = "error"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .select(col("user_id"), tsUs(schema).as("ts_us"), col("event_id"),
        col("event_type"),
        graft.functions.Exact.cents(col("value")).as("value_cents"))
      .as[CdcRow]
    val latest = stream.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[CdcRow], state: GroupState[CdcRow]) =>
          val best = (rows ++ state.getOption.iterator)
            .maxBy(r => (r.ts_us, r.event_id))
          state.update(best)
          best
      }
    val query = latest.toDF().writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    // update-mode memory sink appends one row per key per micro-batch;
    // keep only the final state per key — max by the same (ts_us,
    // event_id) total order the state transition uses — THEN apply the
    // delete filter (the latest row decides), like the batch operator
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"),
        col("value_cents"))).as("s"))
      .select(col("user_id"), col("s.event_id").as("event_id"),
        col("s.event_type").as("event_type"),
        col("s.value_cents").as("value_cents"),
        col("s.ts_us").as("ts_us"))
      .filter(col("event_type") =!= deleteType)
  }

  def runningUserTotals(spark: SparkSession, dir: String,
                        queryName: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = rawSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .select(col("user_id"),
        graft.functions.Exact.cents(col("value")).as("value_cents"))
      .as[UserEvent]
    val totals = stream.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0L))
          var n = prev.n_events
          var cents = prev.value_cents
          events.foreach { e => n += 1; cents += e.value_cents }
          val now = UserTotal(user, n, cents)
          state.update(now)
          now
      }
    val query = totals.toDF().writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    // update-mode memory sink appends each micro-batch's updated rows;
    // with more than one batch a user can appear once per batch. Keep
    // only the final state per user — n_events is monotonically
    // increasing, so max(struct(n_events, value_cents)) is the last row.
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("value_cents"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        col("s.value_cents").as("value_cents"))
  }
}
