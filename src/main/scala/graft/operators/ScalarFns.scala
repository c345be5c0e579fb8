package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function library (SURVEY.md §2.B "Scalar function library"):
  * string, math, date/time, array/list, struct/map, JSON — the intersection
  * of the reference's declared surface (`duckdb_sql_info.cpp:96-186`) with
  * Spark built-ins. Everything here is a codegen'd Catalyst expression; no
  * UDFs.
  *
  * Cross-engine type notes baked into the oracle SQL: DuckDB LENGTH/
  * LEVENSHTEIN/ROW_NUMBER return BIGINT where Spark returns INT (oracle
  * casts); DuckDB EXTRACT(DOW) is 0=Sunday where Spark dayofweek is
  * 1=Sunday (Spark side subtracts 1).
  */
object ScalarFns {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table(name)
  }

  val ops: Seq[Op] = Seq(
    Op("fn_string",
      "SELECT p_partkey, UPPER(p_brand) AS up, LOWER(p_type) AS lo, SUBSTRING(p_type,1,4) AS t4, " +
      "CAST(LENGTH(p_name) AS INTEGER) AS len, CONCAT(p_brand,'-',p_type) AS ct, REPLACE(p_type,'A','_') AS rp, " +
      "LPAD(CAST(p_size AS VARCHAR),5,'0') AS pd, TRIM(CONCAT(' ',p_name,' ')) AS tr, REVERSE(p_brand) AS rv " +
      "FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_type"), 1, 4).as("t4"),
        length(col("p_name")).as("len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("ct"),
        regexp_replace(col("p_type"), "A", "_").as("rp"),
        lpad(col("p_size").cast("string"), 5, "0").as("pd"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
        reverse(col("p_brand")).as("rv")
      ).orderBy("p_partkey").limit(100)
    },

    Op("fn_string2",
      "SELECT p_partkey, LEFT(p_name,4) AS lf, RIGHT(p_name,3) AS rt, REPEAT(p_brand,2) AS rp2, MD5(p_name) AS h, " +
      "CAST(LEVENSHTEIN(p_type,'SMALL') AS INTEGER) AS lev, CAST(POSITION('a' IN p_name) AS INTEGER) AS pos, " +
      "CONTAINS(p_name,'ring') AS has_ring, SPLIT_PART(p_name,' ',1) AS w1 FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("left(p_name, 4)").as("lf"),
        expr("right(p_name, 3)").as("rt"),
        repeat(col("p_brand"), 2).as("rp2"),
        md5(col("p_name")).as("h"),
        levenshtein(col("p_type"), lit("SMALL")).as("lev"),
        instr(col("p_name"), "a").as("pos"),
        col("p_name").contains("ring").as("has_ring"),
        expr("split_part(p_name, ' ', 1)").as("w1")
      ).orderBy("p_partkey").limit(100)
    },

    Op("fn_math",
      "SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_quantity),6) AS sq, CAST(CEIL(l_discount*100) AS BIGINT) AS ce, " +
      "CAST(FLOOR(l_tax*100) AS BIGINT) AS fl, ROUND(LN(l_extendedprice),6) AS ln_p, ROUND(LOG10(l_extendedprice),6) AS lg10, " +
      "ROUND(POWER(l_quantity,2),4) AS pw, CAST(MOD(l_linenumber,3) AS INTEGER) AS md, CAST(SIGN(l_discount-0.05) AS DOUBLE) AS sg, " +
      "ROUND(EXP(l_discount),6) AS ex, CAST(GREATEST(l_quantity,l_discount*100) AS DOUBLE) AS gr, " +
      "CAST(LEAST(l_tax,l_discount) AS DOUBLE) AS ls FROM lineitem " +
      // (l_orderkey, l_linenumber) is not unique: extend the sort with every
      // source column the outputs derive from so ties are identical rows
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax LIMIT 100") { (s, d) =>
      t(s, d, "lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .limit(100)
        .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        ceil(col("l_discount") * 100).as("ce"),
        floor(col("l_tax") * 100).as("fl"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(log10(col("l_extendedprice")), 6).as("lg10"),
        round(pow(col("l_quantity"), 2), 4).as("pw"),
        (col("l_linenumber") % 3).as("md"),
        signum(col("l_discount") - 0.05).cast("double").as("sg"),
        round(exp(col("l_discount")), 6).as("ex"),
        greatest(col("l_quantity"), col("l_discount") * 100).cast("double").as("gr"),
        least(col("l_tax"), col("l_discount")).cast("double").as("ls")
      )
    },

    Op("fn_datetime",
      "SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo, " +
      "CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d, CAST(DATE_TRUNC('MONTH',o_orderdate) AS DATE) AS mstart, " +
      "CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus1y, CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS eom, " +
      "CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) AS dow, CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS wk, " +
      "CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy, " +
      "CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k, " +
      "STRFTIME(o_orderdate, '%Y-%m') AS ym FROM orders ORDER BY o_orderkey LIMIT 200") { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
        expr("CAST(o_orderdate + INTERVAL '1' YEAR AS DATE)").as("plus1y"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        weekofyear(col("o_orderdate")).as("wk"),
        dayofyear(col("o_orderdate")).as("doy"),
        datediff(lit(java.sql.Date.valueOf("2000-01-01")), col("o_orderdate").cast("date")).as("days_to_y2k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym")
      ).orderBy("o_orderkey").limit(200)
    },

    Op("fn_array",
      "SELECT o_orderkey, SPLIT_PART(o_orderpriority,'-',1) AS pri_num, CAST(LEN(STRING_SPLIT(o_orderpriority,'-')) AS INTEGER) AS ntok, " +
      "STRING_SPLIT(o_orderpriority,'-')[2] AS pri_word FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        expr("split_part(o_orderpriority, '-', 1)").as("pri_num"),
        size(split(col("o_orderpriority"), "-")).as("ntok"),
        element_at(split(col("o_orderpriority"), "-"), 2).as("pri_word")
      ).orderBy("o_orderkey").limit(100)
    },

    Op("fn_explode",
      "SELECT CAST(n_nationkey AS INTEGER) AS nk, CAST(UNNEST(GENERATE_SERIES(1,3)) AS INTEGER) AS i " +
      "FROM nation WHERE n_nationkey < 3 ORDER BY nk, i") { (s, d) =>
      t(s, d, "nation")
        .filter(col("n_nationkey") < 3)
        .select(col("n_nationkey").as("nk"), explode(sequence(lit(1), lit(3))).as("i"))
        .orderBy("nk", "i")
    },

    Op("fn_json",
      "SELECT event_id, CAST(JSON_EXTRACT_STRING(props,'$.k') AS INTEGER) AS k FROM events ORDER BY event_id LIMIT 200") { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id").limit(200)
    },

    Op("fn_struct",
      "SELECT n_nationkey, STRUCT_PACK(key := n_nationkey, name := n_name).name AS sname, " +
      "MAP_EXTRACT(MAP([n_name],[n_nationkey]), n_name)[1] AS mval FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        struct(col("n_nationkey").as("key"), col("n_name").as("name")).getField("name").as("sname"),
        element_at(map(col("n_name"), col("n_nationkey")), col("n_name")).as("mval")
      ).orderBy("n_nationkey")
    },

    // Edit distance, character translation, delimited-field extraction,
    // code-point construction/search (DuckDB LEVENSHTEIN/STRPOS → BIGINT;
    // oracle casts to Spark's INT).
    Op("fn_string4",
      "SELECT n_nationkey, CAST(LEVENSHTEIN(n_name,'NATION_1') AS INTEGER) AS lev, " +
      "TRANSLATE(n_name,'AT0','@+o') AS tr, SPLIT_PART(n_name,'_',2) AS num_part, " +
      "CHR(65+n_nationkey%26) AS ch, CAST(STRPOS(n_name,'1') AS INTEGER) AS pos1 " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        levenshtein(col("n_name"), lit("NATION_1")).as("lev"),
        translate(col("n_name"), "AT0", "@+o").as("tr"),
        split_part(col("n_name"), lit("_"), lit(2)).as("num_part"),
        expr("chr(65 + n_nationkey % 26)").as("ch"),
        instr(col("n_name"), "1").as("pos1")
      ).orderBy("n_nationkey")
    },

    // Calendar parts, epoch seconds, date construction, strftime-style
    // formatting, day arithmetic. (DuckDB EPOCH→DOUBLE and parts→BIGINT;
    // oracle casts to Spark's BIGINT/INT.)
    Op("fn_datetime3",
      "SELECT o_orderkey, CAST(QUARTER(o_orderdate) AS INTEGER) AS q, " +
      "CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS wk, CAST(DAYOFYEAR(o_orderdate) AS INTEGER) AS doy, " +
      "CAST(EPOCH(o_orderdate) AS BIGINT) AS ep, " +
      "MAKE_DATE(2000, CAST(MONTH(o_orderdate) AS INTEGER), 15) AS md, " +
      "STRFTIME(o_orderdate, '%Y/%m/%d') AS fmt, " +
      "CAST(DATE_DIFF('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dd, " +
      "LAST_DAY(CAST(o_orderdate AS DATE)) AS ld " +
      "FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(100).select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        weekofyear(col("o_orderdate")).as("wk"),
        dayofyear(col("o_orderdate")).as("doy"),
        unix_timestamp(col("o_orderdate")).as("ep"),
        make_date(lit(2000), month(col("o_orderdate")), lit(15)).as("md"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("fmt"),
        datediff(col("o_orderdate").cast("date"), lit("1997-01-01").cast("date")).as("dd"),
        last_day(col("o_orderdate").cast("date")).as("ld")
      )
    },

    // The parse direction: strptime/to_timestamp_ntz round-trip through a
    // formatted string, epoch milliseconds, component-wise construction.
    Op("fn_parse",
      "SELECT o_orderkey, STRPTIME(STRFTIME(o_orderdate, '%d/%m/%Y %H:%M'), '%d/%m/%Y %H:%M') AS parsed, " +
      "CAST(EPOCH_MS(o_orderdate) AS BIGINT) AS ems, " +
      "MAKE_TIMESTAMP(CAST(YEAR(o_orderdate) AS INTEGER), CAST(MONTH(o_orderdate) AS INTEGER), 15, 6, 30, 0.0) AS mts " +
      "FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(100).select(
        col("o_orderkey"),
        to_timestamp_ntz(date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm"),
          lit("dd/MM/yyyy HH:mm")).as("parsed"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ems"),
        expr("make_timestamp_ntz(year(o_orderdate), month(o_orderdate), 15, 6, 30, 0)").as("mts")
      )
    },

    // Map construction/introspection beyond fn_struct's single-key extract.
    Op("fn_map",
      "SELECT n_nationkey, ARRAY_TO_STRING(MAP_KEYS(MAP(['a','b'],[n_nationkey, n_regionkey])),',') AS ks, " +
      "ARRAY_TO_STRING(MAP_VALUES(MAP(['a','b'],[n_nationkey, n_regionkey])),',') AS vs, " +
      "CAST(CARDINALITY(MAP(['a','b'],[n_nationkey, n_regionkey])) AS INTEGER) AS n, " +
      "MAP_EXTRACT(MAP(['a','b'],[n_nationkey, n_regionkey]), 'b')[1] AS vb " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      val m = map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey"))
      t(s, d, "nation").select(
        col("n_nationkey"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(map_values(m).cast("array<string>"), ",").as("vs"),
        size(m).as("n"),
        element_at(m, "b").as("vb")
      ).orderBy("n_nationkey")
    },

    // Array search/flatten/set-intersection/overlap. LIST_INTERSECT is
    // unordered in DuckDB — both sides sort before serializing.
    Op("fn_array3",
      "SELECT n_nationkey, CAST(LIST_POSITION([n_regionkey+10, n_nationkey+30, n_nationkey], n_nationkey) AS INTEGER) AS pos, " +
      "ARRAY_TO_STRING(FLATTEN([[n_nationkey],[n_regionkey, 7]]),',') AS flat, " +
      "ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT([n_nationkey, n_regionkey, 7],[7, n_regionkey])),',') AS inter, " +
      "LIST_HAS_ANY([n_nationkey, 3],[n_regionkey, 8]) AS overlap " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        array_position(array(col("n_regionkey") + 10, col("n_nationkey") + 30, col("n_nationkey")),
          col("n_nationkey")).cast("int").as("pos"),
        array_join(flatten(array(array(col("n_nationkey")), array(col("n_regionkey"), lit(7))))
          .cast("array<string>"), ",").as("flat"),
        array_join(sort_array(array_intersect(array(col("n_nationkey"), col("n_regionkey"), lit(7)),
          array(lit(7), col("n_regionkey")))).cast("array<string>"), ",").as("inter"),
        arrays_overlap(array(col("n_nationkey"), lit(3)), array(col("n_regionkey"), lit(8))).as("overlap")
      ).orderBy("n_nationkey")
    },

    // Cryptographic digests (hex-identical across engines).
    Op("fn_hash",
      "SELECT n_nationkey, MD5(n_name) AS m, SHA256(n_name) AS sh FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        md5(col("n_name")).as("m"),
        sha2(col("n_name"), 256).as("sh")
      ).orderBy("n_nationkey")
    },

    // Casts incl. TRY_CAST null-on-failure semantics. (Double→int is omitted
    // deliberately: DuckDB rounds while Spark truncates — a real dialect
    // difference, documented here rather than papered over.)
    Op("fn_cast",
      "SELECT n_nationkey, CAST(n_nationkey AS VARCHAR) AS s, CAST(n_nationkey AS DOUBLE) AS dbl, " +
      "TRY_CAST(SPLIT_PART(n_name,'_',2) AS INTEGER) AS num_ok, TRY_CAST(n_name AS INTEGER) AS num_fail, " +
      "CAST('1997-03-05' AS DATE) AS dt, TRY_CAST('nope' AS DATE) AS dt_fail " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        col("n_nationkey").cast("string").as("s"),
        col("n_nationkey").cast("double").as("dbl"),
        expr("try_cast(split_part(n_name,'_',2) AS INT)").as("num_ok"),
        expr("try_cast(n_name AS INT)").as("num_fail"),
        lit("1997-03-05").cast("date").as("dt"),
        expr("try_cast('nope' AS DATE)").as("dt_fail")
      ).orderBy("n_nationkey")
    },

    // Null handling: COALESCE/IFNULL/NULLIF, null-safe comparison
    // (IS [NOT] DISTINCT FROM = Spark's <=>).
    Op("fn_cond",
      "SELECT n_nationkey, NULLIF(n_regionkey, 2) AS maybe_null, IFNULL(NULLIF(n_regionkey,2), -1) AS backfilled, " +
      "COALESCE(NULLIF(n_regionkey,2), NULLIF(n_regionkey,0), 99) AS chain, " +
      "NULLIF(n_regionkey,2) IS NOT DISTINCT FROM NULL AS was_two, " +
      "n_regionkey IS DISTINCT FROM 2 AS not_two FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        nullif(col("n_regionkey"), lit(2)).as("maybe_null"),
        ifnull(nullif(col("n_regionkey"), lit(2)), lit(-1)).as("backfilled"),
        coalesce(nullif(col("n_regionkey"), lit(2)), nullif(col("n_regionkey"), lit(0)), lit(99)).as("chain"),
        (nullif(col("n_regionkey"), lit(2)) <=> lit(null)).as("was_two"),
        (!(col("n_regionkey") <=> lit(2))).as("not_two")
      ).orderBy("n_nationkey")
    },

    // Higher-order list functions (transform/filter/aggregate/zip_with ↔
    // DuckDB list lambdas). Interpreted (CodegenFallback) in Spark — fine on
    // short arrays, never used on hot 100 TB paths (see TextPipeline).
    Op("fn_hof",
      "SELECT n_nationkey, ARRAY_TO_STRING(LIST_TRANSFORM([n_nationkey, n_regionkey, 7], x -> x*2),',') AS doubled, " +
      "ARRAY_TO_STRING(LIST_FILTER([n_nationkey, n_regionkey, 7], x -> x > 3),',') AS big, " +
      "CAST(LIST_SUM(LIST_TRANSFORM([n_nationkey, n_regionkey, 7], x -> x*x)) AS BIGINT) AS sumsq, " +
      "ARRAY_TO_STRING(LIST_TRANSFORM(LIST_ZIP([n_nationkey, n_regionkey], [10, 20]), x -> x[1]*x[2]),',') AS zipped " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        array_join(transform(array(col("n_nationkey"), col("n_regionkey"), lit(7)), x => x * 2).cast("array<string>"), ",").as("doubled"),
        array_join(filter(array(col("n_nationkey"), col("n_regionkey"), lit(7)), x => x > 3).cast("array<string>"), ",").as("big"),
        aggregate(array(col("n_nationkey"), col("n_regionkey"), lit(7)), lit(0L), (acc, x) => acc + (x * x).cast("long")).as("sumsq"),
        array_join(zip_with(array(col("n_nationkey"), col("n_regionkey")), array(lit(10), lit(20)), (x, y) => x * y).cast("array<string>"), ",").as("zipped")
      ).orderBy("n_nationkey")
    },

    // JSON arrays: length + indexed extraction from a constructed document.
    Op("fn_json2",
      "SELECT n_nationkey, CAST(JSON_ARRAY_LENGTH(CONCAT('[', n_nationkey, ',', n_regionkey, ',9]')) AS INTEGER) AS alen, " +
      "CAST(JSON_EXTRACT(CONCAT('[', n_nationkey, ',', n_regionkey, ',9]'), '$[1]') AS INTEGER) AS second " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      val doc = concat(lit("["), col("n_nationkey"), lit(","), col("n_regionkey"), lit(",9]"))
      t(s, d, "nation").select(
        col("n_nationkey"),
        json_array_length(doc).cast("int").as("alen"),
        get_json_object(doc, "$[1]").cast("int").as("second")
      ).orderBy("n_nationkey")
    },

    // Global regex extraction (all matches, serialized — the driver comparator
    // cannot hash raw array cells) and match counting.
    Op("fn_regex2",
      "SELECT doc_id, COALESCE(ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text,'[0-9]+'),','),'') AS nums, " +
      "CAST(LEN(REGEXP_EXTRACT_ALL(text,'[a-z]{7,}')) AS INTEGER) AS longwords " +
      "FROM documents ORDER BY doc_id LIMIT 200") { (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        // coalesce matches the oracle's COALESCE(...,''): symmetric if a
        // future fixture ever contains NULL text
        coalesce(array_join(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)), ","), lit("")).as("nums"),
        size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0))).as("longwords")
      ).orderBy("doc_id").limit(200)
    }
  )
}
