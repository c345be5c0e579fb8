package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** The second wave of DuckDB-dialect aliases: each asserts the exact value
  * DuckDB 1.0 produces for the same text (checked against an embedded
  * DuckDB run while authoring).
  */
class DuckDbCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("len dispatches on type: string length vs list cardinality") {
    val r = spark.sql("SELECT len('abc') AS a, len(array(1,2,3)) AS b, " +
      "len(string_split('x y z', ' ')) AS c").collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 3 && r.getInt(2) == 3)
    // the shape our reference-dialect oracles use constantly
    val s = spark.sql("SELECT list_transform(generate_series(1, len(string_split('a b c',' '))-1), " +
      "i -> i * 10) AS idx").collect()(0)
    assert(s.getSeq[Int](0) == Seq(10, 20))
  }

  test("string/list aliases match DuckDB values") {
    val r = spark.sql(
      "SELECT array_to_string(array(1,2), '-') AS ats, " +
      "list_concat(array(1), array(2)) AS lc, " +
      "list_reverse(array(1,2)) AS lr, " +
      "list_max(array(3,1)) AS mx, list_min(array(3,1)) AS mn, " +
      "strpos('hello', 'll') AS sp, strpos('hello', 'zz') AS sp0, " +
      "regexp_extract_all('a1b22', '[0-9]+') AS rea").collect()(0)
    assert(r.getString(0) == "1-2")
    assert(r.getSeq[Int](1) == Seq(1, 2))
    assert(r.getSeq[Int](2) == Seq(2, 1))
    assert(r.getInt(3) == 3 && r.getInt(4) == 1)
    assert(r.getInt(5) == 3 && r.getInt(6) == 0)
    assert(r.getSeq[String](7) == Seq("1", "22"))
  }

  test("r8 aliases: unnest, list_has_*, list_position, list_extract, regexp_replace options") {
    val r = spark.sql(
      "SELECT list_reverse_sort(array(1,3,2)) AS lrs, " +
      "list_has_any(array(1,2), array(2,9)) AS ha, " +
      "list_has_any(array(1,2), array(8,9)) AS ha0, " +
      "list_has_all(array(1,2,3), array(3,1)) AS hall, " +
      "list_has_all(array(1,2), array(3,1)) AS hall0, " +
      "list_position(array(10,20), 20) AS lp, " +
      "list_position(array(10,20), 99) AS lp0, " +
      "list_extract(array('a','b'), 2) AS le, " +
      "array_length(array(1,2,3)) AS al, " +
      "regexp_replace('aAbA', 'a', 'x', 'gi') AS rrgi, " +
      "regexp_replace('aAbA', 'a', 'x', 'g') AS rrg").collect()(0)
    assert(r.getSeq[Int](0) == Seq(3, 2, 1))
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getLong(5) == 2L && r.isNullAt(6))
    assert(r.getString(7) == "b" && r.getInt(8) == 3)
    assert(r.getString(9) == "xxbx" && r.getString(10) == "xAbA")
    // unnest = explode generator in select position (DuckDB's common form)
    val u = spark.sql("SELECT unnest(array(1,2,3)) AS v").collect().map(_.getInt(0))
    assert(u.toSeq == Seq(1, 2, 3))
    // unsupported regex option fails loudly, not silently
    val e = intercept[Exception](spark.sql("SELECT regexp_replace('a','a','x','z')").collect())
    assert(e.getMessage.contains("unsupported option"))
  }

  test("epoch aliases and list_aggregate reducers") {
    val r = spark.sql(
      "SELECT epoch_us(TIMESTAMP_NTZ '2024-01-01 00:00:00') AS us, " +
      "epoch_ms(TIMESTAMP_NTZ '2024-01-01 00:00:00') AS ms, " +
      "list_aggregate(array(1.0d, 2.0d, 3.0d), 'sum') AS s, " +
      "list_aggregate(array(3, 1), 'min') AS mn, " +
      "list_aggregate(array(3, 1), 'max') AS mx, " +
      "list_aggregate(array(3, 1), 'count') AS c").collect()(0)
    assert(r.getLong(0) == 1704067200000000L)
    assert(r.getLong(1) == 1704067200000L)
    assert(r.getDouble(2) == 6.0)
    assert(r.getInt(3) == 1 && r.getInt(4) == 3 && r.getInt(5) == 2)
  }

  test("aggregate aliases: arg_max/arg_min, string_agg, quantiles match DuckDB values") {
    val r = spark.sql(
      "SELECT arg_max(a, v) AS amax, arg_min(a, v) AS amin, " +
      "string_agg(a) AS sa_default, string_agg(a, ';') AS sa_semi, " +
      "group_concat(a) AS gc, " +
      "quantile_cont(v, 0.25) AS qc, " +
      "quantile_disc(v, 0.9) AS qd " +
      "FROM VALUES ('x', 1), ('y', 9), ('z', 5), ('w', 3) AS t(a, v)").collect()(0)
    assert(r.getString(0) == "y" && r.getString(1) == "x")
    // string_agg default separator is DuckDB's ','; element order follows
    // input order in a single partition — sort-insensitive check
    assert(r.getString(2).split(",").sorted.toSeq == Seq("w", "x", "y", "z"))
    assert(r.getString(3).split(";").sorted.toSeq == Seq("w", "x", "y", "z"))
    assert(r.getString(4).split(",").sorted.toSeq == Seq("w", "x", "y", "z"))
    // quantile_cont(0.25) over {1,3,5,9}: idx 0.75 -> 1 + 0.75*(3-1) = 2.5
    assert(r.getDouble(5) == 2.5)
    // quantile_disc(0.9): smallest element with cume_dist >= 0.9 -> 9
    // (the case that separates the SQL-standard rule from floor(q*(n-1)),
    // probed against DuckDB 1.0 while authoring). Declared narrowing:
    // Spark's PercentileDisc yields DOUBLE where DuckDB keeps the element
    // type — cast when an exact cross-engine dtype is needed.
    assert(r.getDouble(6) == 9.0)
  }

  test("hash/hex/uuid/log/zip aliases match DuckDB values") {
    val r = spark.sql(
      "SELECT sha256('abc') AS sh, to_hex(255) AS hx, to_hex(4096) AS hx2, " +
      "CAST(from_hex('414243') AS STRING) AS fh, " +
      "log(100.0d) AS lg, log(2.0d, 8.0d) AS lgb, " +
      "list_zip(array(1,2), array(10,20,30)) AS z, " +
      "string_to_array('a,b,c', ',') AS sta, " +
      "gen_random_uuid() AS u").collect()(0)
    // expected values are DuckDB 1.0's own output for the same calls
    assert(r.getString(0) == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getString(1) == "FF" && r.getString(2) == "1000")
    assert(r.getString(3) == "ABC")
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 3.0)
    val z = r.getSeq[org.apache.spark.sql.Row](6)
    assert(z.map(p => (Option(p.get(0)), Option(p.get(1)))) ==
      Seq((Some(1), Some(10)), (Some(2), Some(20)), (None, Some(30))))
    assert(z.head.schema == null || z.head.schema.fieldNames.toSeq == Seq("list_1", "list_2"))
    assert(r.getSeq[String](7) == Seq("a", "b", "c"))
    assert(r.getString(8).matches("[0-9a-f-]{36}"))
    // the struct field names are addressable exactly as DuckDB names them
    val f = spark.sql(
      "SELECT list_extract(list_zip(array(1,2), array(30,40)), 2).list_2 AS v").collect()(0)
    assert(f.getInt(0) == 40)
  }

  test("strftime/strptime translate C codes; printf is format_string") {
    val r = spark.sql(
      "SELECT strftime(TIMESTAMP_NTZ '1997-03-05 14:07:09', '%Y/%m/%d') AS ymd, " +
      "strftime(TIMESTAMP_NTZ '1997-03-05 14:07:09', '%d %b %Y') AS dmy, " +
      "strftime(TIMESTAMP_NTZ '1997-03-05 14:07:09', '%H:%M:%S %p') AS hms, " +
      "strftime(TIMESTAMP_NTZ '1997-03-05 14:07:09', 'Day %j of %Y') AS doy, " +
      "CAST(strptime('2024-03-05 14:30:09', '%Y-%m-%d %H:%M:%S') AS STRING) AS parsed, " +
      "printf('%s/%d and %.2f', 'O', 11, 2.5d) AS pf").collect()(0)
    // expected strings are DuckDB 1.0's own output for the same text
    assert(r.getString(0) == "1997/03/05")
    assert(r.getString(1) == "05 Mar 1997")
    assert(r.getString(2) == "14:07:09 PM")
    assert(r.getString(3) == "Day 064 of 1997")
    assert(r.getString(4) == "2024-03-05 14:30:09")
    assert(r.getString(5) == "O/11 and 2.50")
    // unknown % codes fail loudly, never silently mis-format
    val e = intercept[Exception](
      spark.sql("SELECT strftime(TIMESTAMP_NTZ '1997-03-05 00:00:00', '%Q')").collect())
    assert(e.getMessage.contains("unsupported format code"))
  }

  test("list_sort order arg, list_reduce fold, list_indexof") {
    val r = spark.sql(
      "SELECT list_sort(array(3, 1, 2)) AS asc1, " +
      "list_sort(array(3, 1, 2), 'DESC') AS desc1, " +
      "list_sort(array(3, 1, 2), 'asc') AS asc2, " +
      "list_reduce(array(1.0d, 2.0d, 3.0d), (acc, x) -> acc + x) AS red, " +
      "list_indexof(array(10, 20), 20) AS idx, " +
      "list_indexof(array(10, 20), 99) AS missing").collect()(0)
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getSeq[Int](1) == Seq(3, 2, 1))
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    assert(r.getDouble(3) == 6.0)
    assert(r.getLong(4) == 2L)
    assert(r.isNullAt(5))
    // a non-literal / unknown order argument fails loudly, never silently ASC
    val e2 = intercept[Exception](
      spark.sql("SELECT list_sort(array(1), 'sideways')").collect())
    assert(e2.getMessage.contains("ASC") || e2.getMessage.contains("order"))
  }
}
