package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Relational.ts
import Money._

/** Aggregation operators (SURVEY.md §2.B "Aggregations"): hash aggregates with
  * automatic partial (map-side) + final phases, COUNT(DISTINCT), HAVING,
  * global aggregates, ROLLUP/CUBE/GROUPING SETS, order statistics.
  *
  * Double-typed money columns are rounded to 2dp at the output (per
  * SURVEY.md §7.3.1) so cross-engine summation order cannot flip the hash.
  */
object Aggregates {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table(name)
  }

  val ops: Seq[Op] = Seq(
    // TPC-H h01: the pricing-summary report.
    // Money sums run in EXACT DECIMAL on both sides (fixture money columns
    // carry exactly 2 decimals, so the casts are lossless): double summation
    // is order-dependent, and with parallel multi-row-group scans
    // (graft.sources.Layout) Spark's partial-sum combine order no longer
    // matches DuckDB's sequential scan — ROUND(SUM(double),2) near a .005
    // boundary then flips a cent and fails the byte-exact hash (observed:
    // sum_disc_price at sf0.001). Decimal sums are associative, so the
    // oracle is deterministic under ANY partitioning — the same property a
    // 1000-executor run needs. TPC-H itself types these columns DECIMAL.
    Op("agg_h01",
      "SELECT l_returnflag, l_linestatus, " +
      "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_qty, " +
      "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_base_price, " +
      s"CAST(ROUND(SUM($SqlRev),2) AS DOUBLE) AS sum_disc_price, " +
      s"CAST(ROUND(SUM($SqlRev * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))),2) AS DOUBLE) AS sum_charge, " +
      "ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*),2) AS avg_qty, " +
      "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*),2) AS avg_price, " +
      "ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)/COUNT(*),2) AS avg_disc, " +
      "COUNT(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02T00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(dec2("l_quantity")), 2).cast("double").as("sum_qty"),
          round(sum(dec2("l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(sum(revDec), 2).cast("double").as("sum_disc_price"),
          round(sum(revDec * (oneDec + rate2("l_tax"))), 2).cast("double").as("sum_charge"),
          round(sum(dec2("l_quantity")).cast("double") / count(lit(1)), 2).as("avg_qty"),
          round(sum(dec2("l_extendedprice")).cast("double") / count(lit(1)), 2).as("avg_price"),
          round(sum(rate2("l_discount")).cast("double") / count(lit(1)), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Op("agg_distinct",
      "SELECT COUNT(DISTINCT l_suppkey) AS s, COUNT(DISTINCT l_partkey) AS p FROM lineitem") { (s, d) =>
      t(s, d, "lineitem")
        .agg(countDistinct(col("l_suppkey")).as("s"), countDistinct(col("l_partkey")).as("p"))
    },

    Op("agg_having",
      "SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20 ORDER BY c DESC, o_custkey LIMIT 50") { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 20)
        .orderBy(col("c").desc, col("o_custkey")).limit(50)
    },

    // TPC-H h06: global aggregate over a selective filter — at scale the
    // filter and the two read columns push down into the parquet scan.
    Op("agg_global_h06",
      "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))),2) AS DOUBLE) AS revenue FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01T00:00") && col("l_shipdate") < ts("1997-01-01T00:00") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(dec2("l_extendedprice") * rate2("l_discount")), 2).cast("double").as("revenue"))
    },

    Op("agg_minmax",
      "SELECT ROUND(MIN(o_totalprice),2) AS mn, ROUND(MAX(o_totalprice),2) AS mx, COUNT(*) AS n FROM orders") { (s, d) =>
      t(s, d, "orders")
        .agg(round(min("o_totalprice"), 2).as("mn"), round(max("o_totalprice"), 2).as("mx"), count(lit(1)).as("n"))
    },

    Op("agg_rollup",
      "SELECT c_nationkey, c_mktsegment, COUNT(*) AS c, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))),2) AS DOUBLE) AS bal FROM customer " +
      "GROUP BY ROLLUP(c_nationkey, c_mktsegment) ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST") { (s, d) =>
      t(s, d, "customer")
        .rollup("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("c"), round(sum(dec2("c_acctbal")), 2).cast("double").as("bal"))
        .orderBy(col("c_nationkey").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    },

    Op("agg_cube",
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
      "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST") { (s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    Op("agg_grouping_sets",
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c, CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1, " +
      "CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2 FROM orders " +
      "GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),()) " +
      "ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c, CAST(GROUPING(o_orderstatus) AS INT) AS g1,
          |CAST(GROUPING(o_orderpriority) AS INT) AS g2 FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),())
          |ORDER BY g1, g2, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    Op("agg_stats",
      "SELECT ROUND(STDDEV_SAMP(l_quantity),2) AS sd, ROUND(VAR_SAMP(l_quantity),2) AS vr, " +
      "ROUND(CORR(l_quantity,l_extendedprice),2) AS cr FROM lineitem") { (s, d) =>
      t(s, d, "lineitem")
        .agg(round(stddev_samp(col("l_quantity")), 2).as("sd"),
          round(var_samp(col("l_quantity")), 2).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 2).as("cr"))
    },

    Op("agg_median",
      "SELECT ROUND(MEDIAN(l_quantity),2) AS med, ROUND(QUANTILE_CONT(l_quantity,0.9),2) AS p90 FROM lineitem") { (s, d) =>
      t(s, d, "lineitem")
        .agg(round(median(col("l_quantity")), 2).as("med"),
          round(percentile(col("l_quantity"), lit(0.9)), 2).as("p90"))
    },

    // Sketch-based distinct: the ESTIMATES are engine-specific (Spark HLL++
    // vs DuckDB HLL), so the oracle checks the error-bound PROPERTY instead:
    // Spark emits 1 iff its estimate lands within 5% of the exact distinct
    // (HLL++ default rsd = 0.05), and the oracle — which knows only the
    // exact answer — emits the constant 1 the property guarantees. A sketch
    // regression (or a broken rsd config) flips the Spark side to 0 and the
    // hash check goes red.
    Op("agg_approx_distinct",
      "SELECT 1 AS s_within_5pct, 1 AS p_within_5pct") { (s, d) =>
      t(s, d, "lineitem")
        .agg(
          when(abs(approx_count_distinct(col("l_suppkey")) - countDistinct(col("l_suppkey")))
            / countDistinct(col("l_suppkey")) <= 0.05, 1).otherwise(0).as("s_within_5pct"),
          when(abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
            / countDistinct(col("l_partkey")) <= 0.05, 1).otherwise(0).as("p_within_5pct"))
    },

    // The other scale sketch next to HLL: quantile estimation
    // (Greenwald-Khanna `approx_percentile` — mergeable partials, bounded
    // memory, the way percentiles are computed at 100 TB where exact
    // `percentile` would sort-collect each group). Same error-bound oracle
    // pattern as `agg_approx_distinct`: the sketch estimate must land within
    // 1% of the exact quantile computed in the same pass; the oracle emits
    // the constant the property guarantees, so a sketch regression flips
    // the Spark side to 0 and the hash check goes red.
    Op("agg_approx_quantiles",
      "SELECT 1 AS q50_within_1pct, 1 AS q90_within_1pct, 1 AS q99_within_1pct") { (s, d) =>
      val ep = col("l_extendedprice")
      def within(p: Double) =
        when(abs(approx_percentile(ep, lit(p), lit(10000)) - percentile(ep, lit(p)))
          / percentile(ep, lit(p)) <= 0.01, 1).otherwise(0)
      t(s, d, "lineitem")
        .agg(within(0.5).as("q50_within_1pct"),
          within(0.9).as("q90_within_1pct"),
          within(0.99).as("q99_within_1pct"))
    },

    // Equi-width histogram — the profiling aggregate behind every column
    // stats page. Prices quantized to integer cents FIRST (ROUND then cast:
    // DuckDB CAST(double AS BIGINT) rounds while Spark's truncates, so the
    // rounding must be explicit), then pure integer bucket arithmetic:
    // bucket = (cents-lo)*20 div (hi-lo+1) lands every value in [0,20)
    // with no float boundary anywhere. One map-side-combined aggregate plus
    // a broadcast 1-row min/max.
    Op("agg_histogram",
      "WITH b AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem), " +
      "m AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM b) " +
      "SELECT CAST((cents - lo) * 20 // (hi - lo + 1) AS INTEGER) AS bucket, " +
      "CAST(COUNT(*) AS BIGINT) AS n FROM b, m GROUP BY 1 ORDER BY 1") { (s, d) =>
      val b = t(s, d, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val m = b.agg(min("cents").as("lo"), max("cents").as("hi"))
      b.crossJoin(broadcast(m))
        .select(expr("cast((cents - lo) * 20 div (hi - lo + 1) as int)").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // Exact order statistics per group: Spark's percentile() interpolates at
    // p*(n-1) exactly like DuckDB QUANTILE_CONT; percentile_disc matches
    // QUANTILE_DISC (both verified value-for-value on this data).
    Op("agg_percentiles",
      "SELECT l_returnflag, ROUND(QUANTILE_CONT(l_quantity,0.25),2) AS q25, " +
      "ROUND(QUANTILE_CONT(l_quantity,0.5),2) AS q50, ROUND(QUANTILE_CONT(l_quantity,0.75),2) AS q75, " +
      "ROUND(QUANTILE_DISC(l_quantity,0.9),2) AS d90 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(percentile(col("l_quantity"), lit(0.25)), 2).as("q25"),
          round(percentile(col("l_quantity"), lit(0.5)), 2).as("q50"),
          round(percentile(col("l_quantity"), lit(0.75)), 2).as("q75"),
          round(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 2).as("d90"))
        .orderBy("l_returnflag")
    },

    // Higher central moments. Spark's skewness/kurtosis are the *population*
    // definitions (m3/m2^1.5, m4/m2^2-3); DuckDB's built-ins apply sample
    // corrections, so the oracle computes the raw moments explicitly.
    Op("agg_stats2",
      "WITH s AS (SELECT AVG(l_quantity) AS mu FROM lineitem) " +
      "SELECT ROUND(AVG(POWER(l_quantity-mu,3))/POWER(AVG(POWER(l_quantity-mu,2)),1.5),4) AS skew, " +
      "ROUND(AVG(POWER(l_quantity-mu,4))/POWER(AVG(POWER(l_quantity-mu,2)),2)-3,4) AS kurt, " +
      "ROUND(COVAR_POP(l_quantity,l_extendedprice),2) AS cvp, ROUND(COVAR_SAMP(l_quantity,l_extendedprice),2) AS cvs, " +
      "ROUND(STDDEV_POP(l_quantity),4) AS sdp, ROUND(VAR_POP(l_quantity),4) AS vp FROM lineitem, s") { (s, d) =>
      t(s, d, "lineitem")
        .agg(round(skewness(col("l_quantity")), 4).as("skew"),
          round(kurtosis(col("l_quantity")), 4).as("kurt"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cvp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cvs"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp"),
          round(var_pop(col("l_quantity")), 4).as("vp"))
    },

    // Conditional + boolean + bitwise aggregates.
    Op("agg_condagg",
      "SELECT l_returnflag, CAST(COUNT_IF(l_quantity>25) AS BIGINT) AS big_qty, " +
      "BOOL_AND(l_quantity>0) AS all_pos, BOOL_OR(l_discount>0.09) AS any_hi_disc, " +
      "BIT_AND(l_linenumber) AS b_and, BIT_OR(l_linenumber) AS b_or, BIT_XOR(l_linenumber) AS b_xor " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_if(col("l_quantity") > 25).as("big_qty"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_hi_disc"),
          bit_and(col("l_linenumber")).as("b_and"),
          bit_or(col("l_linenumber")).as("b_or"),
          bit_xor(col("l_linenumber")).as("b_xor"))
        .orderBy("l_returnflag")
    },

    // Ordered string aggregation (LISTAGG/STRING_AGG): expressed as
    // sort_array(collect_list) + array_join — deterministic on both engines.
    Op("agg_listagg",
      "SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names FROM nation " +
      "GROUP BY n_regionkey ORDER BY n_regionkey") { (s, d) =>
      t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
        .orderBy("n_regionkey")
    },

    // The SQL-standard ordered spelling: Spark's native
    // LISTAGG ... WITHIN GROUP (ORDER BY ...) vs DuckDB's in-call
    // STRING_AGG(x, sep ORDER BY ...) — same semantics, dialect-specific
    // syntax on each side (descending order to also pin the direction).
    Op("agg_listagg_within",
      "SELECT n_regionkey, STRING_AGG(n_name, '|' ORDER BY n_name DESC) AS names_desc " +
      "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT n_regionkey, " +
        "LISTAGG(n_name, '|') WITHIN GROUP (ORDER BY n_name DESC) AS names_desc " +
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
    },

    // Aggregate FILTER clause — per-aggregate predicates in one pass.
    Op("agg_filter_clause",
      "SELECT l_returnflag, CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big, " +
      "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05),2) AS DOUBLE) AS disc_rev, " +
      "ROUND(AVG(l_quantity) FILTER (WHERE l_tax = 0),2) AS avg_untaxed " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      Tables.ensure(s, d)
      // avg_untaxed stays double: l_quantity is integral, so its sum is
      // exact in double and the average is order-insensitive already
      s.sql("SELECT l_returnflag, COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big, " +
        "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05),2) AS DOUBLE) AS disc_rev, " +
        "ROUND(AVG(l_quantity) FILTER (WHERE l_tax = 0),2) AS avg_untaxed " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    },

    // GROUP BY ALL / ORDER BY ALL — identical syntax in both engines.
    Op("agg_group_by_all",
      "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY ALL ORDER BY ALL") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem GROUP BY ALL ORDER BY ALL")
    },

    // Linear-regression aggregates (both engines implement the SQL standard
    // REGR_* family; rounding absorbs FP accumulation-order differences).
    Op("agg_regr",
      "SELECT ROUND(REGR_SLOPE(l_extendedprice, l_quantity),6) AS slope, " +
      "ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity),2) AS icept, " +
      "ROUND(REGR_R2(l_extendedprice, l_quantity),8) AS r2, " +
      "CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem")
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 8).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
    },

    // mode(): deterministic here — the max frequency is unique per group in
    // this data (verified at sf0.01 and sf0.1).
    Op("agg_mode",
      "SELECT l_returnflag, MODE(l_linenumber) AS common_line FROM lineitem " +
      "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(mode(col("l_linenumber")).as("common_line"))
        .orderBy("l_returnflag")
    },

    // DuckDB's entropy() aggregate: Shannon entropy (log2) over the value
    // DISTRIBUTION of a column. Spark has no such aggregate; the
    // distributed shape is the canonical two-phase aggregation — count per
    // (group, value), then -Σ p·log2 p per group. Both phases are plain
    // hash aggregates with map-side partials; nothing is collected. The
    // same shape at 100 TB: the first groupBy carries (key, value) pairs,
    // bounded by distinct-value count, not row count.
    Op("agg_entropy",
      "SELECT o_orderpriority, ROUND(entropy(o_orderstatus), 6) AS ent, " +
      "CAST(COUNT(*) AS BIGINT) AS n FROM orders " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority") { (s, d) =>
      val counts = t(s, d, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
      val totals = Window.partitionBy("o_orderpriority")
      counts
        .withColumn("tot", sum(col("c")).over(totals))
        .groupBy("o_orderpriority")
        .agg(
          round(-sum((col("c") / col("tot")) * log(2.0, col("c") / col("tot"))), 6)
            .as("ent"),
          sum(col("c")).as("n"))
        .orderBy("o_orderpriority")
    },

    // DuckDB's product() aggregate: Spark has no multiplicative aggregate,
    // but on a positive column it is exactly exp(Σ ln x) — one codegen'd
    // pass, map-side partials, and the oracle's ROUND absorbs the
    // last-ulp difference between the log-sum and DuckDB's running
    // multiply. Declared narrowing: zero/negative inputs need the real
    // multiplicative path (sign tracking), which no reference query uses.
    Op("agg_product",
      "SELECT l_linenumber, ROUND(product(1.0 + l_discount / 10), 6) AS prod " +
      "FROM lineitem WHERE l_orderkey < 100 " +
      "GROUP BY l_linenumber ORDER BY l_linenumber") { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_orderkey") < 100)
        .groupBy("l_linenumber")
        .agg(round(exp(sum(log(lit(1.0) + col("l_discount") / 10))), 6).as("prod"))
        .orderBy("l_linenumber")
    }
  )
}
