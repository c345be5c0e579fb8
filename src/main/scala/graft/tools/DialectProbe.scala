package graft.tools

import graft.{GraftSession, Tables}
import graft.engine._

/** Gap-finder: run a battery of DuckDB-flavored statements through the full
  * engine statement pipeline (all dialect rewrites) and report pass/fail —
  * the cheap way to find real dialect gaps instead of guessing.
  *
  * Run: sbt "runMain graft.tools.DialectProbe"
  */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, "/root/testdata/sf0.001")
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    val s = sessions.getOrCreate("dialect-probe", "alice", "admin")
    // The engine session is an isolated newSession: register the test tables
    // THERE, not only on the root session.
    Tables.ensure(s.spark, "/root/testdata/sf0.001")

    val probes = Seq(
      "basic" -> "SELECT 1 + 1 AS two",
      "from_first" -> "FROM nation SELECT n_name LIMIT 1",
      "columns_regex" -> "SELECT COLUMNS('n_n.*') FROM nation LIMIT 1",
      "exclude" -> "SELECT * EXCLUDE (n_name) FROM nation LIMIT 1",
      "qualify" -> "SELECT n_name FROM nation QUALIFY row_number() OVER (ORDER BY n_name) = 1",
      "list_literal" -> "SELECT [1, 2, 3] AS xs",
      "struct_literal" -> "SELECT {'a': 1, 'b': 'x'} AS st",
      "string_index" -> "SELECT 'abc'[2] AS c",
      "string_slice" -> "SELECT 'abcdef'[2:4] AS sub",
      "cast_op" -> "SELECT 1::VARCHAR AS s",
      "int_div" -> "SELECT 5 // 2 AS d",
      "pow_op" -> "SELECT 2 ** 3 AS p",
      "pow_caret" -> "SELECT 2 ^ 3 AS p",
      "generate_series_tf" -> "SELECT * FROM generate_series(1, 3)",
      "range_tf" -> "SELECT * FROM range(3)",
      "unnest_select" -> "SELECT UNNEST([1, 2, 3]) AS x",
      "list_value" -> "SELECT list_value(1, 2) AS xs",
      "len_fn" -> "SELECT len('abc') AS n",
      "trim_both" -> "SELECT TRIM(BOTH 'x' FROM 'xaxx') AS t",
      "values_table" -> "SELECT x FROM (VALUES (1), (2)) t(x)",
      "distinct_on" -> "SELECT DISTINCT ON (n_regionkey) n_name FROM nation ORDER BY n_regionkey, n_name",
      "filter_clause" -> "SELECT COUNT(*) FILTER (WHERE n_regionkey = 0) AS c FROM nation",
      "group_by_all" -> "SELECT n_regionkey, COUNT(*) FROM nation GROUP BY ALL",
      "ilike" -> "SELECT 'ABC' ILIKE 'a%' AS m",
      "similar_to" -> "SELECT 'abc' SIMILAR TO 'a.*' AS m",
      "interval_add" -> "SELECT DATE '2024-01-01' + INTERVAL 3 DAY AS d",
      "strftime" -> "SELECT strftime(TIMESTAMP '2024-01-02 03:04:05', '%Y-%m') AS s",
      "list_comprehension" -> "SELECT [x * 2 FOR x IN [1, 2, 3]] AS xs",
      "lambda_arrow" -> "SELECT list_transform([1,2,3], x -> x + 1) AS xs",
      "is_distinct" -> "SELECT 1 IS DISTINCT FROM NULL AS d",
      "try_cast" -> "SELECT TRY_CAST('x' AS INTEGER) AS n",
      "string_concat_pipe" -> "SELECT 'a' || 'b' AS ab",
      "between_sym" -> "SELECT 2 BETWEEN 1 AND 3 AS b",
      "list_index_neg_slice" -> "SELECT [1,2,3][-1:] AS last_el",
      "map_literal" -> "SELECT MAP {'k': 1} AS m",
      "date_part" -> "SELECT date_part('year', DATE '2024-05-06') AS y",
      "position_fn" -> "SELECT position('b' IN 'abc') AS p",
      "left_right" -> "SELECT left('abc', 2) AS l, right('abc', 2) AS r",
      "repeat_fn" -> "SELECT repeat('ab', 2) AS s",
      "asof_join" -> ("SELECT e.event_id, p.value AS pv FROM (SELECT event_id, user_id, ts FROM events LIMIT 5) e " +
        "ASOF JOIN (SELECT user_id, ts, value FROM events) p ON e.user_id = p.user_id AND e.ts >= p.ts LIMIT 3"))

    var pass = 0
    probes.foreach { case (name, sql) =>
      try {
        val df = Statement.create(sessions, s, global, sql)
        df.collect()
        pass += 1
        println(f"[dialect] PASS $name")
      } catch {
        case e: Throwable =>
          println(f"[dialect] FAIL $name%-22s ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(160)}")
      }
    }
    println(s"[dialect] $pass/${probes.size} pass")
    spark.stop()
  }
}
