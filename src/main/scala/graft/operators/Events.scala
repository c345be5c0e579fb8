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

    // Ordered conversion funnel signup -> click -> purchase: each stage's
    // first event must follow the user's previous stage strictly in time.
    // Three aggregations + two joins, all keyed on user_id — one logical
    // shuffle key end-to-end, so the funnel runs at cluster width with no
    // per-user state on the driver.
    Op("events_funnel",
      "WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type='signup' GROUP BY user_id), " +
      "c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s ON s.user_id=e.user_id AND e.ts > s.t1 " +
      "WHERE e.event_type='click' GROUP BY e.user_id), " +
      "p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON c.user_id=e.user_id AND e.ts > c.t2 " +
      "WHERE e.event_type='purchase' GROUP BY e.user_id) " +
      "SELECT stage_no, stage, users FROM (" +
      "SELECT 1 AS stage_no, 'signup' AS stage, COUNT(*) AS users FROM s " +
      "UNION ALL SELECT 2, 'click', COUNT(*) FROM c " +
      "UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p) t ORDER BY stage_no") { (s, d) =>
      val e = ev(s, d)
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c1 = e.filter(col("event_type") === "click").as("e")
        .join(s1.as("s"), col("e.user_id") === col("s.user_id") && col("e.ts") > col("s.t1"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
      val p1 = e.filter(col("event_type") === "purchase").as("e")
        .join(c1.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.t2"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
      def stage(no: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(no).as("stage_no"), lit(name).as("stage"), col("users"))
      stage(1, "signup", s1).unionAll(stage(2, "click", c1))
        .unionAll(stage(3, "purchase", p1)).orderBy("stage_no")
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
