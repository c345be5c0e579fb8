package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.SystemCatalog

/** UDF / UDAF surface (SURVEY.md §2.B "UDF / UDAF / UDTF") plus the catalog
  * metadata endpoints exposed as oracle-checkable queries, plus the
  * regex scalar functions and the sliding-window batch check.
  */
object ExtensibilityOps {

  /** Geometric mean as a typed `Aggregator` (the idiomatic Spark UDAF path):
    * buffer = (sum of logs, count); merge is associative so Spark runs it
    * partial+final like any built-in aggregate.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  val ops: Seq[Op] = Seq(
    // Metadata endpoint as a query — DoGetTableTypes (SURVEY §2.A row 18).
    Op("meta_table_types",
      "SELECT * FROM (VALUES ('BASE TABLE'),('LOCAL TEMPORARY'),('VIEW')) t(table_type) ORDER BY table_type") { (s, _) =>
      SystemCatalog.tableTypes(s).orderBy("table_type")
    },

    // Session-scoped scalar UDF registered and invoked through SQL.
    Op("udf_scalar",
      "SELECT o_orderkey, CAST(o_orderkey*2+1 AS BIGINT) AS doubled FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.udf.register("graft_double_it", (x: Long) => x * 2 + 1)
      s.sql("SELECT o_orderkey, graft_double_it(o_orderkey) AS doubled FROM orders ORDER BY o_orderkey LIMIT 100")
    },

    Op("udaf_geomean",
      "SELECT l_returnflag, ROUND(EXP(AVG(LN(l_extendedprice))),2) AS geomean FROM lineitem " +
      "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      Tables.ensure(s, d)
      s.udf.register("graft_geomean", udaf(GeoMean))
      s.sql("SELECT l_returnflag, ROUND(graft_geomean(l_extendedprice),2) AS geomean FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")
    },

    Op("fn_regex",
      "SELECT p_partkey, REGEXP_EXTRACT(p_name,'([a-z]+)',1) AS first_word, " +
      "REGEXP_REPLACE(p_name,'[aeiou]','*','g') AS starred, REGEXP_MATCHES(p_name,'ring|bolt') AS has_rb " +
      "FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
        col("p_name").rlike("ring|bolt").as("has_rb")
      ).orderBy("p_partkey").limit(100)
    },

    Op("fn_bitwise",
      "SELECT n_nationkey, CAST(n_nationkey & 12 AS INTEGER) AS band, CAST(n_nationkey | 3 AS INTEGER) AS bor, " +
      "CAST(XOR(n_nationkey, 21) AS INTEGER) AS bxor, CAST(n_nationkey << 2 AS INTEGER) AS shl, " +
      "CAST(n_nationkey >> 1 AS INTEGER) AS shr, CAST(BIT_COUNT(n_nationkey) AS INTEGER) AS bc " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation").select(
        col("n_nationkey"),
        col("n_nationkey").bitwiseAND(12).as("band"),
        col("n_nationkey").bitwiseOR(3).as("bor"),
        col("n_nationkey").bitwiseXOR(21).as("bxor"),
        expr("shiftleft(n_nationkey, 2)").as("shl"),
        expr("shiftright(n_nationkey, 1)").as("shr"),
        bit_count(col("n_nationkey")).as("bc")
      ).orderBy("n_nationkey")
    },

    Op("meta_catalogs", "SELECT 'spark_catalog' AS catalog_name") { (s, _) =>
      SystemCatalog.catalogs(s)
    },

    Op("fn_datetime2",
      "SELECT o_orderkey, CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m, " +
      "CAST(o_orderdate - INTERVAL 10 DAY AS DATE) AS minus10d, " +
      "CAST(DATE_DIFF('month', CAST(o_orderdate AS DATE), DATE '2000-06-15') AS INTEGER) AS months_to, " +
      "CAST(GREATEST(CAST(o_orderdate AS DATE), DATE '1999-01-01') AS DATE) AS clamped " +
      "FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("orders").select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        date_sub(col("o_orderdate").cast("date"), 10).as("minus10d"),
        // DuckDB date_diff('month') counts month boundaries: (y2-y1)*12+(m2-m1)
        ((lit(2000) - year(col("o_orderdate"))) * 12 + (lit(6) - month(col("o_orderdate"))))
          .cast("int").as("months_to"),
        greatest(col("o_orderdate").cast("date"), lit(java.sql.Date.valueOf("1999-01-01"))).as("clamped")
      ).orderBy("o_orderkey").limit(100)
    },

    // Array results are serialized to CSV strings: the driver's pandas-based
    // comparator cannot sort/hash raw array cells (round-1 fn_array2 failure).
    Op("fn_array2",
      "SELECT n_nationkey, ARRAY_TO_STRING(LIST_SORT([CAST(n_regionkey AS INTEGER), CAST(n_nationkey % 7 AS INTEGER), 3]), ',') AS arr_sorted, " +
      "ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT([CAST(n_regionkey AS INTEGER), CAST(n_nationkey % 5 AS INTEGER)])), ',') AS arr_dedup, " +
      "LIST_CONTAINS([1,3,5], CAST(n_nationkey % 7 AS INTEGER)) AS has_k, " +
      "ARRAY_TO_STRING([CAST(n_nationkey AS INTEGER), CAST(n_regionkey AS INTEGER), 9][1:2], ',') AS sliced " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation").select(
        col("n_nationkey"),
        array_join(array_sort(array(col("n_regionkey"), col("n_nationkey") % 7, lit(3))).cast("array<string>"), ",").as("arr_sorted"),
        array_join(array_sort(array_distinct(array(col("n_regionkey"), col("n_nationkey") % 5))).cast("array<string>"), ",").as("arr_dedup"),
        array_contains(array(lit(1), lit(3), lit(5)), col("n_nationkey") % 7).as("has_k"),
        array_join(slice(array(col("n_nationkey"), col("n_regionkey"), lit(9)), 1, 2).cast("array<string>"), ",").as("sliced")
      ).orderBy("n_nationkey")
    },

    Op("fn_math2",
      "SELECT l_orderkey, l_linenumber, ROUND(SIN(l_discount),6) AS sn, ROUND(COS(l_tax),6) AS cs, " +
      "ROUND(ATAN2(l_discount, l_tax+0.01),6) AS at2, ROUND(RADIANS(l_quantity),6) AS rad, " +
      "ROUND(DEGREES(l_discount),6) AS deg, ROUND(CBRT(l_quantity),6) AS cb, " +
      "CAST(FACTORIAL(l_linenumber) AS BIGINT) AS fact FROM lineitem " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .limit(100)
        .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sin(col("l_discount")), 6).as("sn"),
        round(cos(col("l_tax")), 6).as("cs"),
        round(atan2(col("l_discount"), col("l_tax") + 0.01), 6).as("at2"),
        round(radians(col("l_quantity")), 6).as("rad"),
        round(degrees(col("l_discount")), 6).as("deg"),
        round(cbrt(col("l_quantity")), 6).as("cb"),
        expr("CAST(factorial(l_linenumber) AS BIGINT)").as("fact")
      )
    },

    Op("fn_string3",
      "SELECT p_partkey, TO_BASE64(CAST(p_brand AS BLOB)) AS b64, FORMAT('{}|{}', p_brand, p_size) AS fmt, " +
      "CAST(ASCII(p_name) AS INTEGER) AS a, CHR(65 + CAST(p_size % 26 AS INTEGER)) AS ch, " +
      "CONCAT_WS('-', p_brand, p_type) AS cw FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("part").select(
        col("p_partkey"),
        base64(col("p_brand").cast("binary")).as("b64"),
        format_string("%s|%d", col("p_brand"), col("p_size")).as("fmt"),
        ascii(col("p_name")).as("a"),
        chr(lit(65) + (col("p_size") % 26)).as("ch"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cw")
      ).orderBy("p_partkey").limit(100)
    },

    // L2 (Euclidean) distance nearest neighbors — the metric counterpart of
    // embed_cosine_topk; ordering by the rounded distance for determinism.
    Op("embed_l2",
      "SELECT vec_id, ROUND(LIST_DISTANCE(CAST(embedding AS DOUBLE[]), " +
      "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id=0)),6) AS dist " +
      "FROM embeddings WHERE vec_id <> 0 ORDER BY dist ASC, vec_id LIMIT 10") { (s, d) =>
      Tables.ensure(s, d)
      val e = s.table("embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).first().getSeq[Double](0)
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(graft.functions.VectorFunctions.l2(
            col("embedding").cast("array<double>"), typedLit(q)), 6).as("dist"))
        .orderBy(col("dist").asc, col("vec_id")).limit(10)
    },

    // SQL PIVOT clause (the reference handles PIVOT via its direct-execution
    // fallback, duckdb_statement.cpp:1100-1133; Spark parses it natively —
    // oracle expresses the same result as CASE aggregation).
    Op("pivot_status",
      "SELECT o_orderpriority, CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS F, " +
      "CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS O, " +
      "CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS P " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority") { (s, d) =>
      Tables.ensure(s, d)
      // COALESCE: Spark's pivot yields NULL for absent combinations where
      // the oracle's SUM(CASE) yields 0.
      s.sql("SELECT o_orderpriority, COALESCE(F, 0) AS F, COALESCE(O, 0) AS O, COALESCE(P, 0) AS P " +
        "FROM (SELECT * FROM (SELECT o_orderpriority, o_orderstatus FROM orders) " +
        "PIVOT (COUNT(*) FOR o_orderstatus IN ('F' AS F, 'O' AS O, 'P' AS P))) " +
        "ORDER BY o_orderpriority")
    },

    Op("set_except_all",
      "SELECT seg, COUNT(*) AS c FROM (SELECT c_mktsegment AS seg FROM customer " +
      "EXCEPT ALL SELECT c_mktsegment FROM customer WHERE c_custkey < 750) t GROUP BY seg ORDER BY seg") { (s, d) =>
      Tables.ensure(s, d)
      val c = s.table("customer")
      c.select(col("c_mktsegment").as("seg"))
        .exceptAll(c.filter(col("c_custkey") < 750).select(col("c_mktsegment").as("seg")))
        .groupBy("seg").agg(count(lit(1)).as("c")).orderBy("seg")
    },

    Op("set_intersect_all",
      "SELECT COUNT(*) AS n FROM (SELECT c_nationkey AS k FROM customer " +
      "INTERSECT ALL SELECT CAST(o_custkey % 25 AS INTEGER) FROM orders) t") { (s, d) =>
      Tables.ensure(s, d)
      s.table("customer").select(col("c_nationkey").as("k"))
        .intersectAll(s.table("orders").select((col("o_custkey") % 25).cast("int").as("k")))
        .agg(count(lit(1)).as("n"))
    },

    // Sliding-window aggregate, batch face of EventStreams.slidingAgg
    // (1h window / 30min slide -> each event lands in exactly two windows).
    Op("events_sliding",
      "WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events), " +
      "w AS (SELECT UNNEST([CAST(FLOOR(us/1800000000)*1800000000 AS BIGINT), " +
      "CAST(FLOOR(us/1800000000)*1800000000 - 1800000000 AS BIGINT)]) AS ws, event_type FROM e) " +
      "SELECT make_timestamp(ws) AS wstart, event_type, COUNT(*) AS c FROM w GROUP BY 1,2 ORDER BY 1,2") { (s, d) =>
      Tables.ensure(s, d)
      s.table("events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .select(col("w.start").as("wstart"), col("event_type"), col("c"))
        .orderBy("wstart", "event_type")
    }
  )
}
