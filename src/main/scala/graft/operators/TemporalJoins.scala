package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of and range joins over `events` — the temporal-join surface an
  * analytics engine needs beyond plain equi/theta joins (the reference's SQL
  * backend exposes them via DuckDB's ASOF JOIN and inequality joins; here
  * they are re-expressed as Spark-native plans).
  *
  * Scale shapes:
  *  - As-of join: union + ONE window pass over (key, time) — a single
  *    shuffle on the key, no pair explosion, no range-join fallback to a
  *    nested loop. This is the canonical distributed as-of algorithm; a
  *    direct `ts_b <= ts_a` join would be quadratic per key.
  *  - Banded/range join: the band table is tiny and broadcast, so the fact
  *    side streams through map-side — zero shuffle of the big table.
  *  - Windowed self-join: equi-join on the key carries the shuffle; the time
  *    bounds stay post-join filters on co-partitioned data.
  */
object TemporalJoins {

  private def ev(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("events")
  }

  /** Backward as-of join: for each `left` row, the latest `right` row with
    * `right.tsCol <= left.tsCol` on the same `key`. `payload` columns from
    * the right side are carried to the match (null when no prior row).
    *
    * One shuffle on `key`, one sort per partition — the union+carry-forward
    * formulation keeps the plan linear in rows at any scale. Ties on the
    * right side's timestamp resolve to the row that sorts last by `payload`
    * (deterministic for the oracle comparison).
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Right payload is namespaced before the union — a payload column may
    // share its name with a left column (both sides of `events` carry
    // `value`), and unionByName would otherwise merge them.
    val tagged = left.withColumn("__side", lit(1))
      .unionByName(
        right.select(col(key) +: col(tsCol) +: payload.map(p => col(p).as(s"__r_$p")): _*)
          .withColumn("__side", lit(0)),
        allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol) +: col("__side") +: payload.map(p => col(s"__r_$p")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct per match: all matched fields come from the same
    // right row. Per-column last(..., ignoreNulls) aggregates would skip a
    // null payload for its column while still advancing the matched
    // timestamp, pairing fields from different right rows; the struct is
    // non-null whenever the row is a right row, so a null payload on the
    // latest right row surfaces as (its ts, null) — the row's actual content.
    val matchStruct = struct(col(tsCol).as("ts") +: payload.map(p => col(s"__r_$p").as(p)): _*)
    // NULL parity with the relational oracle: its equi-join never matches a
    // NULL key and its ts comparison is never true against a NULL timestamp,
    // while the window partition would group NULL keys together and a NULL
    // left ts would sort into a frame. Right rows with a NULL key or ts
    // therefore never provide a match, and a left row with a NULL ts
    // reports no match.
    val matchable = col("__side") === 0 && col(key).isNotNull && col(tsCol).isNotNull
    val carried = tagged.withColumn("__m",
      last(when(matchable, matchStruct), ignoreNulls = true).over(w))
    val validLeft = col(tsCol).isNotNull
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        Seq(when(validLeft, col("__m.ts")).as("matched_ts")) ++
        payload.map(p => when(validLeft, col(s"__m.$p")).as(s"matched_$p")): _*)
  }

  /** Forward as-of join: for each `left` row, the EARLIEST `right` row with
    * `right.tsCol >= left.tsCol` on the same `key` — the "next event"
    * lookup (e.g. click → next purchase for conversion attribution).
    * Same union + one-window shape as [[asofBackward]], mirrored: left rows
    * sort before right rows at equal timestamps so the inclusive bound
    * holds under a [current, unbounded following] frame, and ties on the
    * right timestamp resolve to the payload-min row (first in sort order).
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val tagged = left.withColumn("__side", lit(1))
      .unionByName(
        right.select(col(key) +: col(tsCol) +: payload.map(p => col(p).as(s"__r_$p")): _*)
          .withColumn("__side", lit(0)),
        allowMissingColumns = true)
    // asc_nulls_last on the payload tie-break: the relational oracle's
    // MIN(payload) ignores NULLs, so a null-payload right row must lose a
    // same-timestamp tie to any non-null one (Spark's default ASC sorts
    // nulls first, which would win it).
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol) +: when(col("__side") === 1, 0).otherwise(1) +:
        payload.map(p => col(s"__r_$p").asc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matchStruct = struct(col(tsCol).as("ts") +: payload.map(p => col(s"__r_$p").as(p)): _*)
    // Same NULL parity as asofBackward: NULL-key/NULL-ts right rows never
    // match, NULL-ts left rows report no match (they sort nulls-first, so
    // their following frame would otherwise contain every right row).
    val matchable = col("__side") === 0 && col(key).isNotNull && col(tsCol).isNotNull
    val carried = tagged.withColumn("__m",
      first(when(matchable, matchStruct), ignoreNulls = true).over(w))
    val validLeft = col(tsCol).isNotNull
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        Seq(when(validLeft, col("__m.ts")).as("matched_ts")) ++
        payload.map(p => when(validLeft, col(s"__m.$p")).as(s"matched_$p")): _*)
  }

  /** Nearest as-of join: for each `left` row, the `right` row on the same
    * `key` whose `tsCol` is closest in EITHER direction (pandas
    * `merge_asof(direction='nearest')`). Equal gaps resolve backward.
    *
    * Still one union + ONE shuffle on the key: the backward carry-forward
    * and the forward carry-back are two window passes over the same
    * partitioning, so the exchange is shared and each direction adds only
    * an in-partition sort. `tsCol` must be numeric (pass epoch micros for
    * timestamps) so the gap comparison is exact integer arithmetic — the
    * oracle compares EPOCH_US values and a floating-point gap could flip a
    * near-tie.
    */
  def asofNearest(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val tagged = left.withColumn("__side", lit(1))
      .unionByName(
        right.select(col(key) +: col(tsCol) +: payload.map(p => col(p).as(s"__r_$p")): _*)
          .withColumn("__side", lit(0)),
        allowMissingColumns = true)
    // Same per-direction sort orders and tie-breaks as asofBackward /
    // asofForward: backward ties take the payload-max right row, forward
    // ties the payload-min — matching the oracle's MAX/MIN at the chosen ts.
    val wb = Window.partitionBy(key)
      .orderBy(col(tsCol) +: col("__side") +: payload.map(p => col(s"__r_$p")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key)
      .orderBy(col(tsCol) +: when(col("__side") === 1, 0).otherwise(1) +:
        payload.map(p => col(s"__r_$p").asc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matchStruct = struct(col(tsCol).as("ts") +: payload.map(p => col(s"__r_$p").as(p)): _*)
    val matchable = col("__side") === 0 && col(key).isNotNull && col(tsCol).isNotNull
    val carried = tagged
      .withColumn("__mb", last(when(matchable, matchStruct), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(when(matchable, matchStruct), ignoreNulls = true).over(wf))
    val validLeft = col(tsCol).isNotNull
    val pick = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(col("__mf.ts") - col(tsCol) < col(tsCol) - col("__mb.ts"), col("__mf"))
      .otherwise(col("__mb"))
    carried.filter(col("__side") === 1)
      .withColumn("__m", when(validLeft, pick))
      .select(leftCols.map(col) ++
        Seq(col("__m.ts").as("matched_ts"),
          when(col("__m").isNotNull,
            when(col("__m.ts") <= col(tsCol), "b").otherwise("f")).as("matched_dir")) ++
        payload.map(p => col(s"__m.$p").as(s"matched_$p")): _*)
  }

  val ops: Seq[Op] = Seq(
    // As-of join: each purchase matched to the user's latest click at-or-before
    // the purchase time. Oracle expresses the same semantics relationally
    // (max prior ts, then max value among the ties at that ts — the same
    // tie-break the sorted carry-forward applies).
    Op("join_asof",
      "WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='purchase'), " +
      "c AS (SELECT user_id, ts, value FROM events WHERE event_type='click'), " +
      "m AS (SELECT p.event_id, p.user_id, p.ts, p.value, MAX(c.ts) AS click_ts " +
      "FROM p LEFT JOIN c ON c.user_id=p.user_id AND c.ts<=p.ts GROUP BY p.event_id, p.user_id, p.ts, p.value) " +
      "SELECT m.event_id, EPOCH_US(m.ts) AS ts_us, ROUND(m.value,2) AS value, " +
      "EPOCH_US(m.click_ts) AS click_ts_us, ROUND(MAX(c2.value),2) AS click_value " +
      "FROM m LEFT JOIN c c2 ON c2.user_id=m.user_id AND c2.ts=m.click_ts " +
      "GROUP BY m.event_id, m.ts, m.value, m.click_ts ORDER BY event_id") { (s, d) =>
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      asofBackward(purchases, clicks, key = "user_id", tsCol = "ts", payload = Seq("value"))
        .select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          round(col("value"), 2).as("value"),
          unix_micros(col("matched_ts").cast("timestamp")).as("click_ts_us"),
          round(col("matched_value"), 2).as("click_value"))
        .orderBy("event_id")
    },

    // As-of with tolerance: the latest click at-or-before the purchase AND
    // within the lookback hour (merge_asof-style bounded staleness). The
    // tolerance is a post-filter on the unbounded as-of: the latest right
    // row <= ts IS the latest inside any trailing window when it qualifies,
    // and when it's too old nothing in the window exists — so no second
    // join shape is needed and the one-shuffle plan is unchanged.
    Op("join_asof_tol",
      "WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='purchase'), " +
      "c AS (SELECT user_id, ts, value FROM events WHERE event_type='click'), " +
      "m AS (SELECT p.event_id, p.user_id, p.ts, p.value, MAX(c.ts) AS click_ts " +
      "FROM p LEFT JOIN c ON c.user_id=p.user_id AND c.ts<=p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR " +
      "GROUP BY p.event_id, p.user_id, p.ts, p.value) " +
      "SELECT m.event_id, EPOCH_US(m.ts) AS ts_us, ROUND(m.value,2) AS value, " +
      "EPOCH_US(m.click_ts) AS click_ts_us, ROUND(MAX(c2.value),2) AS click_value " +
      "FROM m LEFT JOIN c c2 ON c2.user_id=m.user_id AND c2.ts=m.click_ts " +
      "GROUP BY m.event_id, m.ts, m.value, m.click_ts ORDER BY event_id") { (s, d) =>
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      val raw = asofBackward(purchases, clicks, key = "user_id", tsCol = "ts", payload = Seq("value"))
      val within = col("matched_ts").isNotNull &&
        col("matched_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
      raw.select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          round(col("value"), 2).as("value"),
          when(within, unix_micros(col("matched_ts").cast("timestamp"))).as("click_ts_us"),
          when(within, round(col("matched_value"), 2)).as("click_value"))
        .orderBy("event_id")
    },

    // Forward as-of: each click matched to the user's NEXT purchase at-or-after
    // the click — conversion attribution, the mirrored oracle (min next ts,
    // min value among ties at that ts).
    Op("join_asof_fwd",
      "WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='click'), " +
      "p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'), " +
      "m AS (SELECT c.event_id, c.user_id, c.ts, c.value, MIN(p.ts) AS p_ts " +
      "FROM c LEFT JOIN p ON p.user_id=c.user_id AND p.ts>=c.ts GROUP BY c.event_id, c.user_id, c.ts, c.value) " +
      "SELECT m.event_id, EPOCH_US(m.ts) AS ts_us, ROUND(m.value,2) AS value, " +
      "EPOCH_US(m.p_ts) AS purchase_ts_us, ROUND(MIN(p2.value),2) AS purchase_value " +
      "FROM m LEFT JOIN p p2 ON p2.user_id=m.user_id AND p2.ts=m.p_ts " +
      "GROUP BY m.event_id, m.ts, m.value, m.p_ts ORDER BY event_id") { (s, d) =>
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      asofForward(clicks, purchases, key = "user_id", tsCol = "ts", payload = Seq("value"))
        .select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          round(col("value"), 2).as("value"),
          unix_micros(col("matched_ts").cast("timestamp")).as("purchase_ts_us"),
          round(col("matched_value"), 2).as("purchase_value"))
        .orderBy("event_id")
    },

    // Banded range join: fact rows against a small (lo, hi) band table.
    // The band side is broadcast — the 100 TB plan scans events exactly once
    // with a map-side interval probe, no shuffle, no nested-loop explosion.
    Op("join_range",
      "WITH tiers(tier, lo, hi) AS (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000.0)) " +
      "SELECT tier, COUNT(*) AS n, CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))),2) AS DOUBLE) AS total FROM events JOIN tiers " +
      "ON value >= lo AND value < hi GROUP BY tier ORDER BY tier") { (s, d) =>
      val tiers = s.createDataFrame(Seq(
        ("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000.0)))
        .toDF("tier", "lo", "hi")
      ev(s, d).join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("tier").agg(count(lit(1)).as("n"),
          round(sum(Money.dec2("value")), 2).cast("double").as("total"))
        .orderBy("tier")
    },

    // Windowed self-join: per event, how many same-user events follow within
    // 60 s. The equi key (user_id) carries the one shuffle; the interval
    // bounds are post-join filters on co-partitioned data — the batch face
    // of the stream-stream interval join in `streaming/EventStreams`.
    Op("join_time_range",
      "SELECT a.event_type, COUNT(*) AS n FROM events a JOIN events b ON a.user_id=b.user_id " +
      "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND GROUP BY a.event_type ORDER BY a.event_type") { (s, d) =>
      val e = ev(s, d)
      val a = e.select(col("user_id").as("ua"), col("ts").as("ta"), col("event_type"))
      val b = e.select(col("user_id").as("ub"), col("ts").as("tb"))
      a.join(b, col("ua") === col("ub") && col("tb") > col("ta") &&
          col("tb") <= col("ta") + expr("INTERVAL 60 SECOND"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Nearest as-of: each purchase matched to the user's click closest in
    // time in EITHER direction (merge_asof direction='nearest'); equal gaps
    // resolve backward. The oracle builds both directional candidates
    // relationally, picks the nearer by exact EPOCH_US arithmetic, and
    // resolves same-ts ties with the per-direction MAX/MIN rule — the
    // timestamps travel as epoch micros through the Spark plan so the gap
    // comparison is the same integer arithmetic on both sides.
    Op("join_asof_nearest",
      "WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='purchase'), " +
      "c AS (SELECT user_id, ts, value FROM events WHERE event_type='click'), " +
      "m AS (SELECT p.event_id, p.user_id, p.ts, p.value, " +
      "MAX(CASE WHEN c.ts <= p.ts THEN c.ts END) AS bts, " +
      "MIN(CASE WHEN c.ts >= p.ts THEN c.ts END) AS fts " +
      "FROM p LEFT JOIN c ON c.user_id = p.user_id GROUP BY p.event_id, p.user_id, p.ts, p.value), " +
      "n AS (SELECT event_id, user_id, ts, value, " +
      "CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts " +
      "WHEN EPOCH_US(fts) - EPOCH_US(ts) < EPOCH_US(ts) - EPOCH_US(bts) THEN fts " +
      "ELSE bts END AS mts FROM m) " +
      "SELECT n.event_id, EPOCH_US(n.ts) AS ts_us, ROUND(n.value, 2) AS value, " +
      "EPOCH_US(n.mts) AS match_ts_us, " +
      "CASE WHEN n.mts IS NULL THEN NULL WHEN n.mts <= n.ts THEN 'b' ELSE 'f' END AS dir, " +
      "CASE WHEN n.mts <= n.ts THEN ROUND(MAX(c2.value), 2) ELSE ROUND(MIN(c2.value), 2) END AS match_value " +
      "FROM n LEFT JOIN c c2 ON c2.user_id = n.user_id AND c2.ts = n.mts " +
      "GROUP BY n.event_id, n.ts, n.value, n.mts ORDER BY n.event_id") { (s, d) =>
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      asofNearest(purchases, clicks, key = "user_id", tsCol = "ts_us", payload = Seq("value"))
        .select(col("event_id"), col("ts_us"),
          round(col("value"), 2).as("value"),
          col("matched_ts").as("match_ts_us"),
          col("matched_dir").as("dir"),
          round(col("matched_value"), 2).as("match_value"))
        .orderBy("event_id")
    }
  )
}
