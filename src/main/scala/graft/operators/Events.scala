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

  /** Ordered signup → click → purchase funnel over an events frame with
    * (user_id, event_type, ts). One scan, one shuffle: the three stage
    * thresholds chain as full-partition window aggregates over a single
    * user_id clustering, and the per-user collapse reuses that clustering
    * with no further exchange (the relational form pays 3 aggregations +
    * 2 joins on the same key).
    */
  def funnel(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    e.filter(col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("ts"))).over(w))
      // user_id.isNotNull on the later stages only: the relational form's
      // stage-2/3 equi-joins drop a NULL user (NULL never equals NULL),
      // while its stage-1 GROUP BY keeps the NULL group — the window
      // partition would otherwise carry NULL users through every stage.
      .withColumn("t2", min(when(col("user_id").isNotNull &&
        col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
      .groupBy("user_id").agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .agg(count("t1").as("u1"), count("t2").as("u2"), count("t3").as("u3"))
      .select(expr("stack(3, 1, 'signup', u1, 2, 'click', u2, 3, 'purchase', u3) " +
        "AS (stage_no, stage, users)"))
      .orderBy("stage_no")
  }

  val ops: Seq[Op] = Seq(
    // Tumbling 1h aggregate (batch face of groupBy(window($"ts", "1 hour"))).
    Op("events_hourly",
      // exact-decimal sum: order-insensitive under any partitioning (see
      // graft.operators.Money); value carries exactly 2 decimals
      "SELECT DATE_TRUNC('HOUR', ts) AS h, event_type, COUNT(*) AS c, " +
      "CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS v " +
      "FROM events GROUP BY 1,2 ORDER BY 1,2") { (s, d) =>
      ev(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"),
          round(sum(Money.dec2("value")), 2).cast("double").as("v"))
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
    // ONE scan and ONE shuffle: every stage keys on user_id, so the three
    // stage thresholds chain as full-partition window aggregates over a
    // single hash-clustering of events (t2's predicate reads t1, t3's reads
    // t2 — Catalyst stacks the three Window nodes on one exchange), and the
    // per-user collapse reuses that clustering with no further exchange.
    // The r3 form (3 aggregations + 2 joins, 16 shuffles) re-clustered the
    // same key five times; at 100 TB that is four redundant full-corpus shuffles.
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
      funnel(ev(s, d))
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
    },

    // Rolling weekly-active-users per day (the DAU/WAU/MAU staple). COUNT
    // (DISTINCT) over a RANGE frame isn't a window Spark (or most engines)
    // supports. The scale-safe shape is a bounded EXPLODE, not an interval
    // join: each (user, day) covers exactly the 7 anchor days day..day+6,
    // so generating them (sequence+explode, codegen) and equi-joining the
    // day spine is O(7×act) rows through a hash join — vs the r8/r9
    // broadcast-nested-loop BETWEEN whose O(act×days) predicate evaluations
    // dominate at years-of-events scale. Spine broadcasts (hash, not BNL);
    // expansion happens BEFORE the shuffle so AQE sees the real bytes.
    // Exact integers — deterministic cross-engine.
    Op("events_wau",
      "WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
      "spine AS (SELECT DISTINCT day FROM act) " +
      "SELECT s.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau " +
      "FROM spine s JOIN act a ON a.day BETWEEN s.day - 6 AND s.day " +
      "GROUP BY s.day ORDER BY s.day") { (s, d) =>
      val act = ev(s, d).select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val spine = act.select(col("day").as("anchor")).distinct()
      act.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("anchor"))
        .join(broadcast(spine), "anchor")
        .groupBy(col("anchor").as("day"))
        .agg(countDistinct("user_id").as("wau"))
        .orderBy("day")
    },

    // DAU/MAU stickiness per day — the engagement-quality ratio product
    // teams track (what share of the monthly audience shows up daily).
    // Same bounded-explode shape as events_wau with a 30-day trailing
    // window (30× row expansion, equi-join on day — no nested-loop scan
    // of the spine per activity row); the ratio stays exact as integer
    // per-mille.
    Op("events_stickiness",
      "WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
      "spine AS (SELECT DISTINCT day FROM act), " +
      "dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM act GROUP BY 1), " +
      "mau AS (SELECT s.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS mau " +
      "FROM spine s JOIN act a ON a.day BETWEEN s.day - 29 AND s.day GROUP BY s.day) " +
      "SELECT d.day, d.dau, m.mau, CAST((d.dau * 1000) // m.mau AS BIGINT) AS stickiness_permille " +
      "FROM dau d JOIN mau m USING (day) ORDER BY d.day") { (s, d) =>
      val act = ev(s, d).select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val spine = act.select(col("day").as("anchor")).distinct()
      val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = act.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 29))).as("anchor"))
        .join(broadcast(spine), "anchor")
        .groupBy(col("anchor").as("day"))
        .agg(countDistinct("user_id").as("mau"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          expr("CAST(dau * 1000 div mau AS BIGINT)").as("stickiness_permille"))
        .orderBy("day")
    },

    // Hourly volume anomaly flag: |count - mean| > 2·stddev over the hourly
    // series, evaluated entirely in BIGINT so it is bit-exact cross-engine —
    // z² > 4 rearranges to (n·cnt − total)² > 4·(n·sumsq − total²), no
    // floating-point mean/stddev anywhere. The stats row broadcasts back
    // onto the hourly counts; monitoring at 100 TB keeps this exact shape
    // (the per-hour aggregate is the only data-sized pass).
    Op("events_anomaly",
      "WITH hc AS (SELECT DATE_TRUNC('HOUR', ts) AS h, COUNT(*) AS cnt FROM events GROUP BY 1), " +
      "st AS (SELECT COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS total, " +
      "CAST(SUM(cnt*cnt) AS BIGINT) AS sumsq FROM hc) " +
      "SELECT h, cnt, CAST(CASE WHEN (n*cnt - total)*(n*cnt - total) > 4*(n*sumsq - total*total) " +
      "THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly FROM hc, st ORDER BY h") { (s, d) =>
      val hc = ev(s, d).groupBy(date_trunc("hour", col("ts")).as("h")).agg(count(lit(1)).as("cnt"))
      val st = hc.agg(count(lit(1)).as("n"), sum("cnt").as("total"),
        sum(col("cnt") * col("cnt")).as("sumsq"))
      val dev = col("n") * col("cnt") - col("total")
      hc.crossJoin(broadcast(st))
        .select(col("h"), col("cnt"),
          when(dev * dev > lit(4) * (col("n") * col("sumsq") - col("total") * col("total")), 1)
            .otherwise(0).cast("int").as("is_anomaly"))
        .orderBy("h")
    },

    // Event-transition (Markov) matrix: per-user next-event pairs counted
    // into (from, to, cnt, p) — the behavioral-flow table funnels and
    // recommendation priors start from. One user_id-keyed window (the
    // sessionization exchange) then a tiny aggregate; the conditional
    // probability is one double division of exact BIGINTs, identical on
    // both engines.
    Op("events_markov",
      "WITH nxt AS (SELECT event_type AS from_type, " +
      "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events), " +
      "c AS (SELECT from_type, to_type, COUNT(*) AS cnt FROM nxt WHERE to_type IS NOT NULL GROUP BY 1,2), " +
      "t AS (SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS total FROM c GROUP BY 1) " +
      "SELECT c.from_type, c.to_type, c.cnt, ROUND(CAST(c.cnt AS DOUBLE)/t.total, 4) AS p " +
      "FROM c JOIN t USING (from_type) ORDER BY from_type, to_type") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val nxt = ev(s, d).select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      val c = nxt.filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
      val t = c.groupBy("from_type").agg(sum("cnt").as("total"))
      c.join(broadcast(t), "from_type")
        .select(col("from_type"), col("to_type"), col("cnt"),
          round(col("cnt").cast("double") / col("total"), 4).as("p"))
        .orderBy("from_type", "to_type")
    },

    // Most common 3-step user journeys: every consecutive event-type triple
    // per user (two LEADs over the same user_id window — ONE exchange),
    // counted corpus-wide. The product-analytics "top paths" table; paths
    // that cross users never pair because the window partitions on
    // user_id. Scale: the triple explode is window-local, the count
    // map-side-combines, and only (path, partial-count) rows shuffle.
    Op("events_top_paths",
      "WITH p AS (SELECT event_type AS e1, " +
      "LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2, " +
      "LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3 FROM events) " +
      "SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, CAST(COUNT(*) AS BIGINT) AS n " +
      "FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1 ORDER BY n DESC, path LIMIT 15") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d).select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(" > ", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(15)
    },

    // Activity concentration (power-user / Pareto curve): users ranked into
    // 10 activity deciles, with each decile's user count, event volume, and
    // the cumulative share of all events in integer per-mille — the "top
    // 10% of users generate X% of traffic" table capacity planning and
    // abuse review read. Scale: per-user counts are one aggregation; the
    // decile assignment is the distributed `globalNtile` (range-partitioned
    // — no single-task global sort); the cumulative window runs over the
    // 10-row decile table. Integer arithmetic end-to-end (`div`, per-mille)
    // keeps the oracle value-exact.
    Op("events_power_curve",
      "WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), " +
      "n AS (SELECT user_id, cnt, CAST(NTILE(10) OVER (ORDER BY cnt DESC, user_id) AS INTEGER) AS decile FROM u), " +
      "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM u), " +
      "d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(cnt) AS BIGINT) AS n_events FROM n GROUP BY 1) " +
      "SELECT decile, n_users, n_events, " +
      "CAST((SUM(n_events) OVER (ORDER BY decile) * 1000) // t.total AS BIGINT) AS cum_permille " +
      "FROM d, t ORDER BY decile") { (s, d) =>
      val u = ev(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val deciled = Windows.globalNtile(u, 10, Seq(col("cnt").desc, col("user_id")), "decile")
      val t = u.agg(sum("cnt").cast("long").as("total"))
      val byDecile = deciled.groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"))
      val wCum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile.crossJoin(broadcast(t))
        .withColumn("cum", sum("n_events").over(wCum))
        .select(col("decile"), col("n_users"), col("n_events"),
          expr("CAST((cum * 1000) div total AS BIGINT)").as("cum_permille"))
        .orderBy("decile")
    },

    // Inter-arrival-time distribution: per-user gaps between consecutive
    // events (one LAG over the user_id clustering), summarized corpus-wide
    // as count / integer-mean / exact discrete quantiles / max in micros —
    // the latency-profile table behind session-timeout tuning
    // (events_sessions' 30-min threshold) and traffic modeling. Exact
    // BIGINT micros end-to-end: the mean is SUM div COUNT and the
    // quantiles are QUANTILE_DISC (both engines pick the same
    // smallest-value-with-cume_dist>=q element — the agg_percentiles
    // semantics), so no float ever enters the compare.
    Op("events_inter_arrival",
      "WITH g AS (SELECT CAST(EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_us FROM events) " +
      "SELECT CAST(COUNT(gap_us) AS BIGINT) AS n_gaps, " +
      "CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_us, " +
      "CAST(QUANTILE_DISC(gap_us, 0.5) AS BIGINT) AS p50_us, " +
      "CAST(QUANTILE_DISC(gap_us, 0.9) AS BIGINT) AS p90_us, " +
      "CAST(MAX(gap_us) AS BIGINT) AS max_us FROM g WHERE gap_us IS NOT NULL") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d)
        .select((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))).as("gap_us"))
        .filter(col("gap_us").isNotNull)
        .agg(count(lit(1)).as("n_gaps"),
          expr("CAST(SUM(gap_us) div COUNT(gap_us) AS BIGINT)").as("mean_us"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)").cast("long").as("p50_us"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)").cast("long").as("p90_us"),
          max("gap_us").cast("long").as("max_us"))
    },

    // Session shape distribution: events-per-session and wall duration of
    // every gap-based (30 min) session — the companion to events_sessions'
    // per-user COUNTS: how long and how deep sessions run, the numbers
    // engagement dashboards and timeout tuning actually read. Same
    // sessionization as events_sessions (LAG gap > 30 min starts a
    // session), session ids from a running SUM over the SAME user_id
    // clustering (one exchange total), per-session collapse on that
    // clustering, exact BIGINT micros + QUANTILE_DISC at the top.
    Op("events_session_stats",
      "WITH o AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN prev IS NULL OR EPOCH_US(ts) - EPOCH_US(prev) > 1800000000 THEN 1 ELSE 0 END AS is_new " +
      "FROM (SELECT user_id, ts, event_id, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) t), " +
      "sd AS (SELECT user_id, ts, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS UNBOUNDED PRECEDING) AS sess_no FROM o), " +
      "per AS (SELECT user_id, sess_no, CAST(COUNT(*) AS BIGINT) AS n_events, " +
      "CAST(EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS BIGINT) AS dur_us FROM sd GROUP BY 1, 2) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
      "CAST(SUM(n_events) // COUNT(*) AS BIGINT) AS mean_events, " +
      "CAST(QUANTILE_DISC(n_events, 0.9) AS BIGINT) AS p90_events, " +
      "CAST(QUANTILE_DISC(dur_us, 0.5) AS BIGINT) AS p50_dur_us, " +
      "CAST(QUANTILE_DISC(dur_us, 0.9) AS BIGINT) AS p90_dur_us, " +
      "CAST(MAX(dur_us) AS BIGINT) AS max_dur_us FROM per") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val o = ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          lag(col("ts"), 1).over(w).as("prev"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("prev").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev").cast("timestamp")) > 1800000000L, 1)
            .otherwise(0).as("is_new"))
      val sd = o.select(col("user_id"), col("ts"),
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sess_no"))
      val per = sd.groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts")).cast("timestamp")) -
            unix_micros(min(col("ts")).cast("timestamp"))).as("dur_us"))
      per.agg(count(lit(1)).as("n_sessions"),
        expr("CAST(SUM(n_events) div COUNT(*) AS BIGINT)").as("mean_events"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_events)").cast("long").as("p90_events"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur_us)").cast("long").as("p50_dur_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY dur_us)").cast("long").as("p90_dur_us"),
        max("dur_us").cast("long").as("max_dur_us"))
    },

    // Growth accounting (the new / retained / resurrected / churned
    // decomposition of daily actives — the canonical product-growth
    // table): per (user, active-day), LAG classifies the day as new
    // (first ever), retained (active yesterday too) or resurrected
    // (returning after a gap), and LEAD attributes a churn event to the
    // day AFTER a user's last consecutive active day. One distinct
    // (user, day) projection, ONE user-keyed window pass carrying both
    // LAG and LEAD, and a day-keyed aggregate over the union — the churn
    // rows ride the same frame, just shifted one day. All counts integer.
    Op("events_user_lifecycle",
      "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
      "w AS (SELECT user_id, day, " +
      "LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day, " +
      "LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day FROM d), " +
      "cls AS (SELECT day, CASE WHEN prev_day IS NULL THEN 'new' " +
      "WHEN day - prev_day = 1 THEN 'retained' ELSE 'resurrected' END AS cls FROM w), " +
      "churn AS (SELECT day + 1 AS day, 'churned' AS cls FROM w " +
      "WHERE next_day IS NULL OR next_day - day > 1), " +
      "u AS (SELECT * FROM cls UNION ALL SELECT * FROM churn) " +
      "SELECT day, " +
      "CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
      "CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
      "CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected, " +
      "CAST(SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned " +
      "FROM u GROUP BY day ORDER BY day") { (s, d) =>
      val days = ev(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val marked = days.select(col("user_id"), col("day"),
        lag(col("day"), 1).over(w).as("prev_day"),
        lead(col("day"), 1).over(w).as("next_day"))
      val cls = marked.select(col("day"),
        when(col("prev_day").isNull, "new")
          .when(datediff(col("day"), col("prev_day")) === 1, "retained")
          .otherwise("resurrected").as("cls"))
      val churn = marked
        .filter(col("next_day").isNull || datediff(col("next_day"), col("day")) > 1)
        .select(date_add(col("day"), 1).as("day"), lit("churned").as("cls"))
      cls.unionByName(churn)
        .groupBy("day")
        .agg(sum(when(col("cls") === "new", 1).otherwise(0)).cast("long").as("n_new"),
          sum(when(col("cls") === "retained", 1).otherwise(0)).cast("long").as("n_retained"),
          sum(when(col("cls") === "resurrected", 1).otherwise(0)).cast("long").as("n_resurrected"),
          sum(when(col("cls") === "churned", 1).otherwise(0)).cast("long").as("n_churned"))
        .orderBy("day")
    },

    // Per-type value economics in exact integer cents (the fixture's
    // `value` column carries 2dp amounts): count, total, integer-mean,
    // exact discrete median, max — the revenue summary of the event
    // stream, with the money-as-cents policy that keeps cross-engine
    // comparison exact where raw-double sums would drift.
    Op("events_value_stats",
      "WITH v AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events WHERE value IS NOT NULL) " +
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(cents) AS BIGINT) AS sum_cents, " +
      "CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents, " +
      "CAST(QUANTILE_DISC(cents, 0.5) AS BIGINT) AS p50_cents, " +
      "CAST(MAX(cents) AS BIGINT) AS max_cents " +
      "FROM v GROUP BY event_type ORDER BY event_type") { (s, d) =>
      ev(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"),
          expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").as("mean_cents"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").cast("long").as("p50_cents"),
          max("cents").cast("long").as("max_cents"))
        .orderBy("event_type")
    },

    // Funnel time-to-convert: the latency distribution from a user's first
    // 'view' to their first 'purchase' (converted users only, purchase at
    // or after the view) — the companion number to events_funnel's
    // conversion COUNTS: how long conversion takes, not just whether it
    // happens. Two user-keyed MIN aggregates and one user-keyed join;
    // exact BIGINT micros with QUANTILE_DISC, per the inter-arrival
    // float policy.
    Op("events_funnel_time",
      "WITH v AS (SELECT user_id, MIN(ts) AS first_view FROM events WHERE event_type = 'view' GROUP BY 1), " +
      "p AS (SELECT user_id, MIN(ts) AS first_purchase FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
      "g AS (SELECT CAST(EPOCH_US(first_purchase) - EPOCH_US(first_view) AS BIGINT) AS gap_us " +
      "FROM v JOIN p USING (user_id) WHERE first_purchase >= first_view) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_converted, " +
      "CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_us, " +
      "CAST(QUANTILE_DISC(gap_us, 0.5) AS BIGINT) AS p50_us, " +
      "CAST(QUANTILE_DISC(gap_us, 0.9) AS BIGINT) AS p90_us FROM g") { (s, d) =>
      val e = ev(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("first_view"))
      val p = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ts").as("first_purchase"))
      v.join(p, "user_id")
        .filter(col("first_purchase") >= col("first_view"))
        .select((unix_micros(col("first_purchase").cast("timestamp")) -
          unix_micros(col("first_view").cast("timestamp"))).as("gap_us"))
        .agg(count(lit(1)).as("n_converted"),
          expr("CAST(SUM(gap_us) div COUNT(*) AS BIGINT)").as("mean_us"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)").cast("long").as("p50_us"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)").cast("long").as("p90_us"))
    },

    // Time-series gap filling / densification: each user's sparse daily
    // event counts expanded to EVERY day in their [first, last] activity
    // range — zero-filled holes plus a running cumulative — the regular
    // grid that downstream resampling/forecasting expects (missing days are
    // silently absent from a plain groupBy, which biases any average-over-
    // days). Scale: the grid explodes per user from a 2-column (user,
    // range) aggregate — output is Σ per-user span days, never a users ×
    // global-calendar cross join; the join and window both key on user_id.
    // The user_id < 20 slice keeps the oracle result bounded; the shape is
    // slice-independent.
    Op("events_gapfill",
      "WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM events WHERE user_id < 20 GROUP BY 1, 2), " +
      "r AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1), " +
      "g AS (SELECT user_id, CAST(UNNEST(GENERATE_SERIES(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM r) " +
      "SELECT g.user_id, g.day, CAST(COALESCE(d.c, 0) AS BIGINT) AS cnt, " +
      "CAST(SUM(COALESCE(d.c, 0)) OVER (PARTITION BY g.user_id ORDER BY g.day) AS BIGINT) AS cum_cnt " +
      "FROM g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day " +
      "ORDER BY g.user_id, g.day") { (s, d) =>
      val daily = ev(s, d).filter(col("user_id") < 20)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val ranges = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val grid = ranges.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("c"), lit(0L)).as("cnt"),
          sum(coalesce(col("c"), lit(0L))).over(w).as("cum_cnt"))
        .orderBy("user_id", "day")
    },

    // Last-touch revenue attribution: each purchase's value credits the
    // most recent PRECEDING non-purchase event by the same user (the
    // marketing-analytics staple); purchases with no prior touch credit
    // 'direct'. One user-keyed window pass — last(ignoreNulls) over a
    // CASE that nulls out purchases, so the carry skips other purchases —
    // then a per-channel rollup in exact integer cents.
    Op("events_attribution",
      "WITH a AS (SELECT event_type, value, LAST_VALUE(CASE WHEN event_type <> 'purchase' " +
      "THEN event_type END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch FROM events) " +
      "SELECT COALESCE(touch, 'direct') AS channel, CAST(COUNT(*) AS BIGINT) AS n_purchases, " +
      "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
      "FROM a WHERE event_type = 'purchase' GROUP BY 1 ORDER BY channel") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .select(col("event_type"), col("value"),
          last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
            .over(w).as("touch"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(round(col("value") * 100).cast("long")).cast("long").as("revenue_cents"))
        .orderBy("channel")
    },

    // Cohort lifetime value: users grouped by first-activity week, each
    // cohort's purchase revenue accumulated per week-offset — the LTV
    // curve a growth team reads cohort-over-cohort. Two user-keyed
    // aggregations (first day, then per-(cohort, offset) revenue) and one
    // cumulative window over the tiny cohort×offset grid; money stays in
    // exact integer cents end to end.
    Op("events_cohort_ltv",
      "WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1), " +
      "r AS (SELECT f.user_id, CAST((CAST(e.ts AS DATE) - f.d0) // 7 AS BIGINT) AS week_offset, " +
      "CAST(ROUND(e.value * 100) AS BIGINT) AS cents FROM events e JOIN f USING (user_id) " +
      "WHERE e.event_type = 'purchase' AND e.value IS NOT NULL), " +
      "g AS (SELECT CAST(DATE_TRUNC('week', f.d0) AS DATE) AS cohort_week, r.week_offset, " +
      "CAST(SUM(r.cents) AS BIGINT) AS rev FROM r JOIN f USING (user_id) GROUP BY 1, 2) " +
      "SELECT cohort_week, week_offset, rev AS revenue_cents, " +
      "CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_offset) AS BIGINT) AS cum_revenue_cents " +
      "FROM g ORDER BY cohort_week, week_offset") { (s, d) =>
      val e = ev(s, d)
      val f = e.groupBy("user_id").agg(min(col("ts").cast("date")).as("d0"))
      val r = e.filter(col("event_type") === "purchase" && col("value").isNotNull)
        .join(f, "user_id")
        .select(col("user_id"),
          floor(datediff(col("ts").cast("date"), col("d0")) / 7).cast("long").as("week_offset"),
          round(col("value") * 100).cast("long").as("cents"))
      val g = r.join(f, "user_id")
        .groupBy(date_trunc("week", col("d0")).cast("date").as("cohort_week"),
          col("week_offset"))
        .agg(sum("cents").cast("long").as("rev"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      g.select(col("cohort_week"), col("week_offset"),
          col("rev").as("revenue_cents"),
          sum("rev").over(w).cast("long").as("cum_revenue_cents"))
        .orderBy("cohort_week", "week_offset")
    },

    // Typed property extraction from the JSON props column, per event
    // type: the schema-on-read step every event pipeline runs before
    // analytics (props are stringly-typed at ingest; analysis needs the
    // numbers). Integer-exact stats; one map-side-combined aggregation.
    Op("events_props_stats",
      "WITH p AS (SELECT event_type, CAST(JSON_EXTRACT_STRING(props,'$.k') AS BIGINT) AS k " +
      "FROM events WHERE props IS NOT NULL) " +
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct, " +
      "CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MIN(k) AS BIGINT) AS min_k, " +
      "CAST(MAX(k) AS BIGINT) AS max_k " +
      "FROM p GROUP BY event_type ORDER BY event_type") { (s, d) =>
      ev(s, d).filter(col("props").isNotNull)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct("k").as("n_distinct"),
          sum("k").cast("long").as("sum_k"),
          min("k").cast("long").as("min_k"), max("k").cast("long").as("max_k"))
        .orderBy("event_type")
    }
  )
}
