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
