package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Additive scope — the reference has no streaming (SURVEY.md §1.1); each
  * transform here is written against a DataFrame so the SAME code runs in a
  * batch job and under `readStream` (streaming-batch parity is asserted in
  * StreamingSpec). Watermarks bound state for the 100 TB / unbounded case.
  */
object EventStreams {

  /** Tumbling-window counts + sums per event type. */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("v"))

  /** Sliding-window aggregate (1h window every 30min). */
  def slidingAgg(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("ws"), col("event_type"), col("c"))

  /** Gap-based sessionization with Spark's native session_window — the
    * streaming face of `Events.sessionCounts`.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("v"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"),
        col("n_events"), col("v"))

  /** Exactly-once event dedup inside the watermark horizon. */
  def dedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Custom stateful processing via `flatMapGroupsWithState`: cumulative
    * per-user event count + value total that survives across micro-batches
    * (the escape hatch for state machines `session_window` can't express).
    */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; total += r._2 }
          state.update((n, total))
          Iterator((user, n, math.rint(total * 100) / 100))
      }
      .toDF("user_id", "n", "total")
  }

  /** Streaming Misra-Gries heavy hitters — the streaming face of the batch
    * `text_heavy_hitters` sketch. Event types shard by hash so each type's
    * counters live wholly in ONE group's state (per-shard MG is then exact
    * for every type whose true count exceeds shardTotal/capacity — the
    * standard MG guarantee, now per shard). State per shard is the bounded
    * counter map (≤ capacity entries) plus the shard total; each update
    * emits the shard's current survivors with their lower-bound counts, so
    * downstream picks global top-k by count. Deterministic: decrement-all
    * evictions depend only on multiset counts, not arrival order within a
    * batch? — NO: MG survivor identity IS order-sensitive in general, so
    * the operator reports each survivor's (count_min, shard_total) and the
    * spec asserts the MG guarantee (every type above threshold present,
    * counts within decrement slack), not an exact survivor set.
    */
  def heavyHitters(events: DataFrame, capacity: Int = 8, shards: Int = 4): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.selectExpr("event_type").as[String]
      .groupByKey(t => math.floorMod(t.hashCode, shards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String],
            state: GroupState[(Map[String, Long], Long)]) =>
          var (counters, total) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          rows.foreach { t =>
            total += 1
            counters.get(t) match {
              case Some(n) => counters = counters.updated(t, n + 1)
              case None if counters.size < capacity => counters = counters.updated(t, 1L)
              case None =>
                // decrement-all: every counter loses one, zeros evict
                counters = counters.map { case (k, n) => k -> (n - 1) }.filter(_._2 > 0)
            }
          }
          state.update((counters, total))
          counters.iterator.map { case (t, n) => (shard, t, n, total) }
      }
      .toDF("shard", "event_type", "count_min", "shard_total")
  }

  /** Streaming funnel: per-user signup → click → purchase thresholds,
    * finalized by EVENT-TIME TIMEOUT. Stage-2/3 thresholds depend on the
    * group's full multiset (a late click can lower t2 and thereby change
    * t3), so events buffer in group state until the watermark passes the
    * user's horizon; then the same order-insensitive computation as the
    * batch `Events.funnel` runs once and the state is freed — the
    * buffer-within-watermark pattern for logic windowed aggregates can't
    * express, with state bounded by the horizon, not the stream. Emits one
    * (user_id, t1, t2, t3) row per finalized user (epoch millis, null =
    * stage never reached).
    */
  def statefulFunnel(events: DataFrame, horizonSeconds: Long = 3600L): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stages = Set("signup", "click", "purchase")
    // No event-type pre-filter: a micro-batch whose rows are all filtered
    // out upstream gives this operator an EMPTY input, and flatMapGroups-
    // WithState does not process timed-out groups on an empty batch
    // (measured: groups finalize only in batches where rows reach the
    // operator). Every event flows through; non-funnel types just refresh
    // the user's activity horizon without entering the buffer.
    events
      .withWatermark("ts", s"$horizonSeconds seconds")
      .selectExpr("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[Seq[(String, Long)]]) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            def minOf(tpe: String, after: Option[Long]): Option[Long] = {
              val c = evs.collect { case (t, ts) if t == tpe && after.forall(ts > _) => ts }
              if (c.isEmpty) None else Some(c.min)
            }
            val t1 = minOf("signup", None)
            val t2 = t1.flatMap(a => minOf("click", Some(a)))
            val t3 = t2.flatMap(a => minOf("purchase", Some(a)))
            // Users with zero funnel events produce no row (they only ever
            // refreshed the horizon) — matches the batch form's universe.
            if (evs.isEmpty) Iterator.empty else Iterator((user, t1, t2, t3))
          } else {
            val incoming = rows.map(r => (r._2, r._3.getTime)).toSeq
            val buf = state.getOption.getOrElse(Seq.empty) ++
              incoming.filter(e => stages(e._1))
            state.update(buf)
            val horizonFrom = (buf.map(_._2) ++ incoming.map(_._2)).max
            state.setTimeoutTimestamp(horizonFrom + horizonSeconds * 1000)
            Iterator.empty
          }
      }
      .toDF("user_id", "t1", "t2", "t3")
  }

  /** Streaming AS-OF enrichment: each probe event (default purchase) is
    * matched to the same user's LATEST build event (default click) with
    * `build.ts <= probe.ts` — the streaming face of
    * [[graft.operators.TemporalJoins.asofBackward]]. Out-of-order safety
    * comes from the buffer-within-watermark pattern: a probe only
    * finalizes once the watermark passes its event time (no earlier-ts
    * build row can still arrive), so arrival order never changes the
    * match. State is bounded: pending probes live only until the
    * watermark passes them, and the build buffer prunes to the newest
    * at-or-before-watermark row plus the in-flight tail — per-user state
    * tracks the watermark lag, not the stream length. Equal-ts build ties
    * resolve to the payload max, the batch operator's tie-break.
    * Emits (event_id, user_id, ts_ms, matched_ts_ms, matched_value);
    * unmatched probes emit with nulls (LEFT semantics).
    */
  def streamingAsof(events: DataFrame, probeType: String = "purchase",
      buildType: String = "click", watermark: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // state: (builds as (tsMs, value), pending probes as (event_id, tsMs))
    // No event-type pre-filter (the statefulFunnel lesson): timed-out
    // groups only finalize in batches where rows reach the operator, so a
    // watermark-advancing sentinel of any type must flow through; other
    // types are ignored in-loop.
    events.withWatermark("ts", watermark)
      .selectExpr("event_id", "user_id", "event_type", "ts", "value")
      .as[(Long, Long, String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp, Option[Double])],
            state: GroupState[(Seq[(Long, Option[Double])], Seq[(Long, Long)])]) =>
          var (builds, probes) = state.getOption.getOrElse(
            (Seq.empty[(Long, Option[Double])], Seq.empty[(Long, Long)]))
          rows.foreach { r =>
            val tsMs = r._4.getTime
            if (r._3 == buildType) builds :+= ((tsMs, r._5))
            else if (r._3 == probeType) probes :+= ((r._1, tsMs))
          }
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = probes.partition(_._2 <= wm)
          val out = ready.sortBy(p => (p._2, p._1)).map { case (id, ts) =>
            val m = builds.filter(_._1 <= ts)
            val best =
              if (m.isEmpty) None
              else Some(m.maxBy(b => (b._1, b._2.getOrElse(Double.NegativeInfinity))))
            (id, user, ts, best.map(_._1), best.flatMap(_._2))
          }
          // prune: the newest finalized-range build still serves future
          // probes (their ts > wm >= this build's ts); older ones cannot win
          val cutoff = builds.filter(_._1 <= wm) match {
            case s if s.isEmpty => Long.MinValue
            case s => s.map(_._1).max
          }
          builds = builds.filter(_._1 >= cutoff)
          if (pending.isEmpty && builds.isEmpty) state.remove()
          else {
            state.update((builds, pending))
            // wake when the earliest pending probe can finalize; a
            // build-only group re-arms a horizon past the watermark
            val next = if (pending.nonEmpty) pending.map(_._2).min else wm + 3600000L
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
      }
      .toDF("event_id", "user_id", "ts_ms", "matched_ts_ms", "matched_value")
  }

  /** Stream-stream inner join with an event-time range condition: each
    * purchase joined to the same user's views in the preceding `lookback`.
    * Watermarks on both sides + the time-range predicate let Spark expire
    * join state — the requirement for running this on unbounded streams.
    */
  def viewToPurchaseJoin(events: DataFrame, lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** Stream-stream LEFT OUTER join with the same event-time range condition:
    * purchases with NO view in the lookback still emit — with null view_id —
    * once the watermark passes their join window, i.e. once the engine can
    * PROVE no matching view can still arrive. This is the state-expiry
    * semantics that makes outer joins sound on unbounded streams (an outer
    * row emitted early would be retracted by a late match; Spark instead
    * holds it in join state until the watermark closes the range).
    */
  def viewToPurchaseLeftJoin(events: DataFrame, lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"),
      "left_outer")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** Stream-static join: enrich the event stream with a broadcast dimension
    * table (re-read per micro-batch; no stream state). At 100 TB the static
    * side stays a broadcast as long as the dim fits an executor — the same
    * plan shape Catalyst picks for the batch flavor.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("dim_key"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("dim_label"))

  /** Wire a streaming source through a transform into a memory sink and run
    * it to completion (test/demo harness for the above).
    */
  def runToMemory(spark: SparkSession, input: DataFrame,
      transform: DataFrame => DataFrame, name: String): DataFrame = {
    val q = transform(input).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
