package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series / event operators over `events` — the batch-checkable faces of
  * the Structured Streaming scope (SURVEY.md §2.B "Streaming"; the reference
  * implements none, §1.1). The streaming flavors live in
  * `graft.streaming.EventStreams` and share these aggregation shapes.
  */
object Events {

  private def ev(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("events")
  }

  /** Gap-based sessionization (30 min) as a batch window computation. */
  def sessionCounts(e: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.select(col("user_id"), col("event_id"), col("ts"), lag(col("ts"), 1).over(w).as("prev"))
      .select(col("user_id"),
        when(col("prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) - unix_micros(col("prev").cast("timestamp")) > gapUs, 1)
          .otherwise(0).as("is_new"))
      .groupBy("user_id").agg(sum("is_new").cast("long").as("sessions"))
  }

  val ops: Seq[Op] = Seq(
    // Tumbling 1h aggregate (batch face of groupBy(window($"ts", "1 hour"))).
    Op("events_hourly",
      "SELECT DATE_TRUNC('HOUR', ts) AS h, event_type, COUNT(*) AS c, ROUND(SUM(value),2) AS v " +
      "FROM events GROUP BY 1,2 ORDER BY 1,2") { (s, d) =>
      ev(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
        .orderBy("h", "event_type")
    },

    Op("events_sessions",
      "WITH o AS (SELECT user_id, event_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) " +
      "SELECT user_id, CAST(SUM(CASE WHEN prev IS NULL OR EPOCH_US(ts)-EPOCH_US(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS sessions " +
      "FROM o GROUP BY user_id ORDER BY user_id") { (s, d) =>
      sessionCounts(ev(s, d), 1800000000L).orderBy("user_id")
    },

    // Day-over-day retention: users active on day d who return on d+1.
    // Self-join on the distinct (user, day) activity set — the cohort shape
    // every event pipeline computes; distributes as one shuffle on user_id.
    Op("events_retention",
      "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) " +
      "SELECT a.day AS day, CAST(COUNT(*) AS BIGINT) AS retained " +
      "FROM d a JOIN d b ON b.user_id = a.user_id AND b.day = a.day + 1 " +
      "GROUP BY a.day ORDER BY a.day") { (s, d) =>
      val act = ev(s, d).select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      act.as("a").join(act.as("b"),
          col("b.user_id") === col("a.user_id") && col("b.day") === date_add(col("a.day"), 1))
        .groupBy(col("a.day").as("day"))
        .agg(count(lit(1)).as("retained"))
        .orderBy("day")
    }
  )
}
