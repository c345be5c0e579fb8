package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY.md §2.B "Window functions"): ranking, analytic,
  * and frame-based aggregates over `Window.partitionBy(..).orderBy(..)`.
  * Partitioned windows parallelize across executors (one shuffle on the
  * partition key). A window with no PARTITION BY would collapse to a
  * single-partition sort; `win_ntile` instead uses the two-phase
  * [[globalNtile]] so even global-order ranking stays distributed.
  */
object Windows {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table(name)
  }

  /** Exact global NTILE without a single-partition WindowExec AND without
    * leaving Tungsten: range-partitioned sort (distributed), then
    * `monotonically_increasing_id` — which encodes (partition id << 33 |
    * local offset) — turned into an exact global rank by adding each
    * partition's cumulative row offset, then SQL NTILE's arithmetic (the
    * first `total % n` tiles get one extra row).
    *
    * The per-partition counts come from a second branch over the SAME
    * sorted-with-ids dataset; the offsets relation is one row per
    * partition, broadcast back onto the rows. Everything stays codegen'd
    * columnar — no RDD[Row] conversion, no driver-side count job (the
    * previous `rdd.zipWithIndex` formulation ran 3 jobs and deserialized
    * every row). The id project is CACHED before fanning out: both branches
    * must read the SAME materialized ids — relying on exchange reuse is not
    * enough, because AQE may re-plan the two subtree copies with different
    * coalesced layouts, skewing the offsets against the join side (observed
    * as ragged tiles on 60k rows under a default-conf session; the cache
    * pins one id assignment the way a layout pass would persist its sorted
    * output). MEMORY_AND_DISK, so evicted partitions spill rather than
    * recompute. This is the scalable form of `NTILE(n) OVER (ORDER BY ...)`;
    * the window version moves the whole table onto one task.
    */
  def globalNtile(df: DataFrame, n: Int, sortCols: Seq[org.apache.spark.sql.Column],
      out: String): DataFrame = {
    val inCols = df.columns
    val mid = df.orderBy(sortCols: _*).withColumn("__mid", monotonically_increasing_id()).cache()
    def pid(c: org.apache.spark.sql.Column) = shiftright(c, 33)
    // Cumulative offsets + grand total over one row per partition — the
    // single-partition window here is over ~hundreds of rows, not the data.
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = mid.groupBy(pid(col("__mid")).as("__pid")).agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum("__cnt").over(wOff), lit(0L)).as("__off"),
        sum("__cnt").over(wTot).as("__total"))
    mid.join(broadcast(offs), pid(col("__mid")) === col("__pid"))
      .withColumn("__idx", col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      // Integer-exact tile arithmetic (`div` stays in longs); the else
      // branch's divisor is only zero when total < n, in which case every
      // row satisfies the when-branch and the else never evaluates.
      .withColumn(out, expr(
        s"cast(case when __idx < (__total % $n) * (__total div $n + 1) " +
        s"then __idx div (__total div $n + 1) " +
        s"else (__idx - (__total % $n) * (__total div $n + 1)) div (__total div $n) + __total % $n " +
        s"end + 1 as int)"))
      .select(inCols.map(col) :+ col(out): _*)
  }

  /** Exact per-group NTILE — `NTILE(n) OVER (PARTITION BY group ORDER BY
    * sort)` — without per-group single-task windows. A plain partitioned
    * window puts each group on ONE task, so a billion-row group (one
    * dominant language in a corpus) serializes; here the sort is a
    * range-partitioned exchange over (group, sort) — a big group simply
    * spans several partitions — and ranks-within-group come from the same
    * id arithmetic as [[globalNtile]] plus one extra per-(partition, group)
    * aggregate column: the block's minimum local id, which anchors each
    * row's offset inside its block. Per-group cumulative offsets and totals
    * are a window over one row per (partition, group) — hundreds of rows —
    * broadcast back. Same single data shuffle as globalNtile.
    */
  def groupedNtile(df: DataFrame, n: Int, groupCols: Seq[String],
      sortCols: Seq[org.apache.spark.sql.Column], out: String): DataFrame = {
    val inCols = df.columns
    val keys = groupCols.map(col) ++ sortCols
    // Cached for the same both-branches-must-agree reason as globalNtile.
    val mid = df.orderBy(keys: _*).withColumn("__mid", monotonically_increasing_id()).cache()
    def pid(c: org.apache.spark.sql.Column) = shiftright(c, 33)
    def local(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit((1L << 33) - 1))
    // One row per (partition, group) block: its size and where it starts
    // locally. Rows of a block are contiguous after the (group, sort)-keyed
    // range sort, so local-id minus the block's min local id is the row's
    // offset inside the block.
    val wOff = Window.partitionBy(groupCols.map(col): _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Group columns renamed on the offsets side: offs derives from `mid`, so
    // the join is a self-join by lineage and unqualified names are ambiguous.
    val offs = mid.groupBy((pid(col("__mid")).as("__pid") +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"), min(local(col("__mid"))).as("__lmin"))
      .select((groupCols.map(g => col(g).as(s"__g_$g")) :+ col("__pid") :+ col("__lmin") :+
        coalesce(sum("__cnt").over(wOff), lit(0L)).as("__off") :+
        sum("__cnt").over(wTot).as("__total")): _*)
    val joinCond = (pid(col("__mid")) === col("__pid")) &&
      groupCols.map(g => mid(g) <=> col(s"__g_$g")).reduce(_ && _)
    mid.join(broadcast(offs), joinCond)
      .withColumn("__idx", col("__off") + (local(col("__mid")) - col("__lmin")))
      .withColumn("__t", col("__total"))
      .withColumn(out, expr(
        s"cast(case when __idx < (__t % $n) * (__t div $n + 1) " +
        s"then __idx div (__t div $n + 1) " +
        s"else (__idx - (__t % $n) * (__t div $n + 1)) div (__t div $n) + __t % $n " +
        s"end + 1 as int)"))
      .select(inCols.map(mid(_)) :+ col(out): _*)
  }

  private val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
  private val byNationBal = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)

  val ops: Seq[Op] = Seq(
    Op("win_rownum",
      "SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn " +
      "FROM orders ORDER BY o_custkey, rn LIMIT 100") { (s, d) =>
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(byCust).as("rn"))
        .orderBy("o_custkey", "rn").limit(100)
    },

    Op("win_rank",
      "SELECT s_nationkey, s_suppkey, CAST(RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INTEGER) AS rk, " +
      "CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INTEGER) AS drk " +
      "FROM supplier ORDER BY s_nationkey, rk, s_suppkey") { (s, d) =>
      t(s, d, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          rank().over(byNationBal).as("rk"), dense_rank().over(byNationBal).as("drk"))
        .orderBy("s_nationkey", "rk", "s_suppkey")
    },

    Op("win_lag_lead",
      "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d, " +
      "CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS prev_d, " +
      "CAST(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS next_d " +
      "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200") { (s, d) =>
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
          lag(col("o_orderdate"), 1).over(byCust).cast("date").as("prev_d"),
          lead(col("o_orderdate"), 1).over(byCust).cast("date").as("next_d"))
        .orderBy("o_custkey", "o_orderkey").limit(200)
    },

    Op("win_running_sum",
      "SELECT o_custkey, o_orderkey, ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_total FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200") { (s, d) =>
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("run_total"))
        .orderBy("o_custkey", "o_orderkey").limit(200)
    },

    // Holistic aggregate over a moving frame: rolling MEDIAN (the
    // monitoring-query profile). DuckDB runs MEDIAN OVER natively; Spark
    // rejects order-sensitive aggregates in ordered frames
    // (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame is
    // collected (≤6 rows/frame — bounded by the ROWS clause, never the
    // partition), sorted, and the midpoint interpolated — exactly
    // MEDIAN's even/odd rule.
    // Prices quantized to integer CENTS first (the agg_histogram rule):
    // the middle-pair average is then exactly representable (x.0/x.5) on
    // both engines, where raw-double (a+b)/2 vs DuckDB's interpolation
    // differed in the last ulp and flipped ROUND at cent boundaries
    // (measured: 7/200 one-cent diffs).
    Op("win_median",
      "SELECT o_orderkey, MEDIAN(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (" +
      "PARTITION BY o_custkey % 10 ORDER BY o_orderkey " +
      "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS med_cents " +
      "FROM orders ORDER BY o_orderkey LIMIT 200") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(
        "SELECT o_orderkey, (element_at(a, CAST((size(a)+1) div 2 AS INT)) + " +
        "element_at(a, CAST(size(a) div 2 AS INT) + 1)) / 2 AS med_cents FROM (" +
        "SELECT o_orderkey, sort_array(collect_list(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (" +
        "PARTITION BY o_custkey % 10 ORDER BY o_orderkey " +
        "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)) AS a FROM orders) " +
        "ORDER BY o_orderkey LIMIT 200")
    },

    Op("win_ntile",
      "SELECT o_orderkey, CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS tile " +
      "FROM orders ORDER BY o_orderkey LIMIT 200") { (s, d) =>
      globalNtile(t(s, d, "orders").select("o_orderkey", "o_totalprice"), 4,
          Seq(col("o_totalprice"), col("o_orderkey")), "tile")
        .select("o_orderkey", "tile")
        .orderBy("o_orderkey").limit(200)
    },

    // Explicit ROWS frames: trailing window, forward-looking window, and the
    // whole-partition frame — deterministic because (o_orderdate, o_orderkey)
    // totally orders each partition.
    Op("win_frames",
      "SELECT o_custkey, o_orderkey, " +
      "ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),2) AS avg3, " +
      "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING),2) AS next2, " +
      "ROUND(MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),2) AS mx " +
      "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200") { (s, d) =>
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(avg("o_totalprice").over(byCust.rowsBetween(-2, Window.currentRow)), 2).as("avg3"),
          round(sum("o_totalprice").over(byCust.rowsBetween(1, 2)), 2).as("next2"),
          round(max("o_totalprice").over(
            byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2).as("mx"))
        .orderBy("o_custkey", "o_orderkey").limit(200)
    },

    Op("win_rank2",
      "SELECT s_nationkey, s_suppkey, ROUND(PERCENT_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey),6) AS pr, " +
      "ROUND(CUME_DIST() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey),6) AS cd, " +
      "NTH_VALUE(s_name, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_s " +
      "FROM supplier ORDER BY s_nationkey, s_suppkey") { (s, d) =>
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
      t(s, d, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("s_name"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_s"))
        .orderBy("s_nationkey", "s_suppkey")
    },

    // Time-interval RANGE frame over the events stream: a trailing one-hour
    // sliding aggregate per user — the windowed-analytics shape a 100 TB event
    // pipeline runs constantly. RANGE semantics make ties on ts well-defined;
    // (user_id, ts) is unique in this data and event_id orders the output.
    Op("win_range_interval",
      "SELECT event_id, user_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),2) AS hr_sum, " +
      "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_cnt " +
      "FROM events ORDER BY event_id LIMIT 500") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(
        """SELECT event_id, user_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
          |RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW),2) AS hr_sum,
          |COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
          |RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS hr_cnt
          |FROM events ORDER BY event_id LIMIT 500""".stripMargin)
    },

    // IGNORE NULLS navigation (dialects place the modifier differently:
    // DuckDB inside the call, Spark after it).
    Op("win_ignore_nulls",
      "SELECT o_orderkey, LAG(NULLIF(o_custkey % 5, 2) IGNORE NULLS) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_nn, " +
      "FIRST_VALUE(NULLIF(o_custkey % 5, 2) IGNORE NULLS) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn " +
      "FROM orders ORDER BY o_orderkey LIMIT 300") { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
      val nn = nullif(col("o_custkey") % 5, lit(2))
      t(s, d, "orders")
        .select(col("o_orderkey"),
          lag(nn, 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          first(nn, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_nn"))
        .orderBy("o_orderkey").limit(300)
    },

    Op("win_first_last",
      "SELECT s_nationkey, s_suppkey, " +
      "FIRST_VALUE(s_name) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_s, " +
      "LAST_VALUE(s_name) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_s " +
      "FROM supplier ORDER BY s_nationkey, s_suppkey") { (s, d) =>
      val full = byNationBal.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          first(col("s_name")).over(full).as("first_s"),
          last(col("s_name")).over(full).as("last_s"))
        .orderBy("s_nationkey", "s_suppkey")
    },

    // RFM segmentation (recency / frequency / monetary quartiles) — the
    // customer-analytics staple, built on THREE chained `globalNtile` passes
    // so every global quartile ranking runs distributed (the naive
    // `NTILE(4) OVER (ORDER BY ...)` would move all customers onto one
    // task). Ties break on o_custkey so both engines rank identically.
    Op("win_rfm",
      "WITH cust AS (SELECT o_custkey, " +
      "CAST(DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE), " +
      "(SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS BIGINT) AS r_days, " +
      "COUNT(*) AS freq, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))),2) AS DOUBLE) AS monetary FROM orders GROUP BY o_custkey) " +
      "SELECT o_custkey, r_days, freq, monetary, " +
      "CAST(NTILE(4) OVER (ORDER BY r_days, o_custkey) AS INTEGER) AS r_q, " +
      "CAST(NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS INTEGER) AS f_q, " +
      "CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER) AS m_q " +
      "FROM cust ORDER BY o_custkey") { (s, d) =>
      val o = t(s, d, "orders")
      // The anchor date is a scalar query parameter (like the embedding
      // query vectors), not distributed state.
      val anchor = o.agg(max(col("o_orderdate").cast("date"))).first().getDate(0)
      val cust = o.groupBy("o_custkey").agg(
        datediff(lit(anchor), max(col("o_orderdate").cast("date"))).cast("long").as("r_days"),
        count(lit(1)).as("freq"),
        round(sum(Money.dec2("o_totalprice")), 2).cast("double").as("monetary"))
      val ranked = globalNtile(
        globalNtile(
          globalNtile(cust, 4, Seq(col("r_days"), col("o_custkey")), "r_q"),
          4, Seq(col("freq").desc, col("o_custkey")), "f_q"),
        4, Seq(col("monetary").desc, col("o_custkey")), "m_q")
      ranked.select(col("o_custkey"), col("r_days"), col("freq"), col("monetary"),
          col("r_q"), col("f_q"), col("m_q"))
        .orderBy("o_custkey")
    },

    // Inter-order gap analysis: per customer, count of gaps plus min/max/avg
    // days between consecutive orders — one LAG window over the per-customer
    // clustering. Day diffs are integers, so even the average is exact
    // cross-engine (integer sums are order-independent; one division at
    // the end, rounded).
    Op("win_order_gap",
      "WITH g AS (SELECT o_custkey, DATE_DIFF('day', " +
      "CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE), " +
      "CAST(o_orderdate AS DATE)) AS gap FROM orders) " +
      "SELECT o_custkey, CAST(COUNT(gap) AS BIGINT) AS n_gaps, CAST(MIN(gap) AS BIGINT) AS min_gap, " +
      "CAST(MAX(gap) AS BIGINT) AS max_gap, ROUND(AVG(gap), 2) AS avg_gap " +
      "FROM g WHERE gap IS NOT NULL GROUP BY o_custkey ORDER BY o_custkey") { (s, d) =>
      val gap = datediff(col("o_orderdate").cast("date"),
        lag(col("o_orderdate"), 1).over(byCust).cast("date"))
      t(s, d, "orders")
        .select(col("o_custkey"), gap.as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_gaps"), min("gap").cast("long").as("min_gap"),
          max("gap").cast("long").as("max_gap"), round(avg("gap"), 2).as("avg_gap"))
        .orderBy("o_custkey")
    },

    // Window frame EXCLUDE (SQL:2011; DuckDB executes it natively, Spark has
    // no EXCLUDE clause). Composed from plain frames: EXCLUDE CURRENT ROW on
    // a trailing frame is the same frame ending at 1 PRECEDING; over a whole
    // partition it is (sum - current) / (count - 1); EXCLUDE GROUP subtracts
    // the ORDER-BY-peer group's own aggregate (one extra window keyed on the
    // peer value). Prices quantized to integer cents first so both engines
    // divide the SAME exact integers — the one double division each side
    // then lands on the same bits, and ROUND(...,2) can't straddle.
    Op("win_frame_exclude",
      "WITH o AS (SELECT o_orderkey, o_custkey, " +
      "substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS oyear, " +
      "CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents FROM orders WHERE o_custkey <= 200) " +
      "SELECT o_orderkey, o_custkey, " +
      "ROUND(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) / 100.0, 2) AS roll2_excl, " +
      // The excluded-frame averages stay in INTEGER milli-cents (exact sum,
      // integer division): a float division + ROUND flips .005 boundaries
      // differently per engine (measured — 9 rows at sf0.01 off by one
      // cent), while BIGINT arithmetic is bit-exact on both.
      "CAST(SUM(cents) OVER (PARTITION BY o_custkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) * 1000 " +
      "// NULLIF(COUNT(cents) OVER (PARTITION BY o_custkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW), 0) AS BIGINT) AS loo_avg_mc, " +
      "CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY oyear " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) * 1000 " +
      "// NULLIF(COUNT(cents) OVER (PARTITION BY o_custkey ORDER BY oyear " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP), 0) AS BIGINT) AS nonyear_avg_mc, " +
      // EXCLUDE TIES: peers leave the frame but the current row stays —
      // composed as (sum - groupSum + current) / (count - groupCount + 1)
      "CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY oyear " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) * 1000 " +
      "// NULLIF(COUNT(cents) OVER (PARTITION BY o_custkey ORDER BY oyear " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES), 0) AS BIGINT) AS nonties_avg_mc " +
      "FROM o ORDER BY o_custkey, o_orderkey") { (s, d) =>
      val cents = expr("cast(round(o_totalprice*100) as bigint)")
      val wRoll = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, -1)
      val wAll = Window.partitionBy("o_custkey")
      val wYear = Window.partitionBy(col("o_custkey"), col("oyear"))
      t(s, d, "orders").filter(col("o_custkey") <= 200)
        .select(col("o_orderkey"), col("o_custkey"),
          substring(col("o_orderdate").cast("string"), 1, 4).as("oyear"),
          cents.as("cents"))
        .withColumn("__s", sum("cents").over(wAll))
        .withColumn("__c", count("cents").over(wAll))
        .withColumn("__gs", sum("cents").over(wYear))
        .withColumn("__gc", count("cents").over(wYear))
        .select(col("o_orderkey"), col("o_custkey"),
          round(sum("cents").over(wRoll) / 100.0, 2).as("roll2_excl"),
          when(col("__c") > 1,
            expr("(__s - cents) * 1000L div (__c - 1)")).as("loo_avg_mc"),
          when(col("__c") > col("__gc"),
            expr("(__s - __gs) * 1000L div (__c - __gc)")).as("nonyear_avg_mc"),
          expr("(__s - __gs + cents) * 1000L div (__c - __gc + 1)").as("nonties_avg_mc"))
        .orderBy("o_custkey", "o_orderkey")
    }
  )
}
