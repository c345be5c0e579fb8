package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** Values pinned against DuckDB 1.0 probes (same literals run there). */
class DateCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  // date_diff must pass through the dialect chain: Spark's PARSER owns
  // that spelling (timestampdiff rule), so FunctionRenames redirects it.
  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(Dialect.rewrite(sql)).collect()(0)

  test("date_diff counts boundaries crossed, signed") {
    val r = one(
      "SELECT date_diff('month', DATE '2020-01-31', DATE '2020-02-01') AS a, " +
      "date_diff('year', DATE '2020-12-31', DATE '2021-01-01') AS b, " +
      "date_diff('day', TIMESTAMP '2020-01-01 23:00:00', TIMESTAMP '2020-01-02 01:00:00') AS c, " +
      "date_diff('hour', TIMESTAMP '2020-01-01 10:59:00', TIMESTAMP '2020-01-01 12:01:00') AS d, " +
      "date_diff('minute', TIMESTAMP '2020-01-01 10:59:59', TIMESTAMP '2020-01-01 11:00:00') AS e, " +
      "date_diff('week', DATE '2024-03-03', DATE '2024-03-04') AS f, " +
      "date_diff('quarter', DATE '2020-03-31', DATE '2020-04-01') AS g, " +
      "date_diff('day', DATE '2020-01-05', DATE '2020-01-01') AS h, " +
      "datediff('day', DATE '2020-01-01', DATE '2020-01-05') AS i")
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 2L)
    assert(r.getLong(4) == 1L)
    assert(r.getLong(5) == 1L)  // Sunday -> Monday crosses a week boundary
    assert(r.getLong(6) == 1L)
    assert(r.getLong(7) == -4L) // signed
    assert(r.getLong(8) == 4L)
  }

  test("2-arg datediff keeps Spark's end-minus-start day semantics") {
    assert(one("SELECT datediff(DATE '2020-01-05', DATE '2020-01-01') AS d")
      .getInt(0) == 4)
  }

  test("time_bucket floors onto the 2000-01-03 origin grid") {
    val r = one(
      "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-05 10:22:11') AS a, " +
      "time_bucket(INTERVAL '1 day', TIMESTAMP '2024-03-05 10:22:11') AS b, " +
      "time_bucket(INTERVAL '1 week', DATE '2024-03-05') AS c, " +
      "time_bucket(INTERVAL '1 week', DATE '2000-01-02') AS d, " +
      "time_bucket(INTERVAL '2 hours', TIMESTAMP '1999-12-31 23:10:00') AS e")
    assert(r.get(0).toString == "2024-03-05 10:15:00.0")
    assert(r.get(1).toString == "2024-03-05 00:00:00.0")
    assert(r.get(2).toString == "2024-03-04") // Monday
    assert(r.get(3).toString == "1999-12-27") // pre-origin week floors DOWN
    assert(r.get(4).toString == "1999-12-31 22:00:00.0")
  }

  test("month-granularity time_bucket anchors at 2000-01-01") {
    val r = one(
      "SELECT time_bucket(INTERVAL '1 month', DATE '2024-03-05') AS a, " +
      "time_bucket(INTERVAL '3 months', DATE '2024-05-05') AS b, " +
      "time_bucket(INTERVAL '1 year', DATE '2024-03-05') AS c, " +
      "time_bucket(INTERVAL '2 years', DATE '2021-03-05') AS d")
    assert(r.get(0).toString == "2024-03-01")
    assert(r.get(1).toString == "2024-04-01")
    assert(r.get(2).toString == "2024-01-01")
    assert(r.get(3).toString == "2020-01-01")
  }

  test("dayname/monthname give full names; format/to_base/gcd/lcm/ord") {
    val r = one(
      "SELECT dayname(DATE '2024-03-05') AS a, monthname(DATE '2024-03-05') AS b, " +
      "format('{} x {}', 3, 'a') AS c, to_base(255, 16) AS d, to_base(7, 2) AS e, " +
      "gcd(12, 18) AS f, lcm(4, 6) AS g, ord('abc') AS h, unicode('x') AS i, " +
      "prefix('spark', 'sp') AS j, suffix('spark', 'rk') AS k, " +
      "to_base64(CAST('ab' AS BINARY)) AS l, " +
      "CAST(from_base64('YWI=') AS STRING) AS m")
    assert(r.getString(0) == "Tuesday")
    assert(r.getString(1) == "March")
    assert(r.getString(2) == "3 x a")
    assert(r.getString(3) == "FF")
    assert(r.getString(4) == "111")
    assert(r.getLong(5) == 6L)
    assert(r.getLong(6) == 12L)
    assert(r.getInt(7) == 97)
    assert(r.getInt(8) == 120)
    assert(r.getBoolean(9) && r.getBoolean(10))
    assert(r.getString(11) == "YWI=")
    assert(r.getString(12) == "ab")
  }

  test("format rejects real format specs loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT format('{:.2f}', 1.5) AS x").collect()
    }
    assert(e.getMessage.contains("unsupported spec") ||
      e.getCause != null && e.getCause.getMessage.contains("unsupported spec"))
  }

  test("time_bucket over a column resolves through the RuntimeReplaceable") {
    import spark.implicits._
    Seq("2024-03-05 10:22:11", "2024-03-05 10:37:00").toDF("s")
      .createOrReplaceTempView("tb_rows")
    val rows = spark.sql(
      "SELECT time_bucket(INTERVAL '15 minutes', CAST(s AS TIMESTAMP)) AS b " +
      "FROM tb_rows ORDER BY b").collect()
    assert(rows.map(_.get(0).toString).toSeq ==
      Seq("2024-03-05 10:15:00.0", "2024-03-05 10:30:00.0"))
  }
}
