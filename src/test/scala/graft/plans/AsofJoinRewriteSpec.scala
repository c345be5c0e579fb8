package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

/** The ASOF JOIN dialect rewrite: DuckDB's syntax desugared to the
  * union + one-window carry-forward. Semantics are pinned here on
  * constructed fixtures (ties, strictness, direction, NULLs, naming); the
  * value-level cross-engine check is the `compat_asof_sql` oracle, which
  * runs the SAME text natively on DuckDB.
  */
class AsofJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 15L, 150.0), (3L, 7L, 70.0))
      .toDF("k", "t", "amt").createOrReplaceTempView("asof_l")
    Seq((1L, 5L, "b"), (1L, 10L, "a"), (1L, 10L, "z"), (2L, 30L, "c"))
      .toDF("k", "t", "v").createOrReplaceTempView("asof_r")
  }

  private def run(sql: String): Array[(Long, Long, Option[Long], Option[String])] =
    spark.sql(AsofJoinRewrite.rewrite(sql, spark)).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getAs[String](3)))
    }

  test("no-op without top-level ASOF; literals and subqueries untouched") {
    val plain = "SELECT 1 AS a FROM region"
    assert(AsofJoinRewrite.rewrite(plain, spark) == plain)
    val lit = "SELECT 'ASOF JOIN in a string' AS s FROM region"
    assert(AsofJoinRewrite.rewrite(lit, spark) == lit)
  }

  test("'asof' as a plain identifier is not a join keyword") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("asof", "v").createOrReplaceTempView("asof_ident")
    // column reference, qualified reference, and alias spelled 'asof': all
    // valid SQL, none may trigger (or crash) the rewrite
    for (sql <- Seq(
        "SELECT asof FROM asof_ident",
        "SELECT t.asof FROM asof_ident t",
        "SELECT v AS asof FROM asof_ident",
        "SELECT asof + 1 AS a1 FROM asof_ident WHERE asof > 0")) {
      assert(AsofJoinRewrite.rewrite(sql, spark) == sql, sql)
      assert(spark.sql(AsofJoinRewrite.rewrite(sql, spark)).count() == 1L, sql)
    }
  }

  test("ASOF JOIN nested in a parenthesized subquery rewrites (multi-ASOF composes)") {
    setup()
    // inner ASOF resolves each left row's latest right value, outer ASOF
    // joins that result against the right side again — the documented way to
    // run two ASOF joins in one statement
    val sql =
      "SELECT x.k, x.t, x.v, r2.v AS v2 " +
      "FROM (SELECT l.k, l.t, r.v FROM asof_l l ASOF LEFT JOIN asof_r r " +
      "ON l.k = r.k AND l.t >= r.t) x " +
      "ASOF LEFT JOIN asof_r r2 ON x.k = r2.k AND x.t >= r2.t " +
      "ORDER BY x.k, x.t"
    val out = spark.sql(AsofJoinRewrite.rewrite(sql, spark))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[String](2)), Option(r.getAs[String](3))))
    // k=1: t=10 -> struct-max tie 'z'; t=20 -> latest at-or-before is t=10 'z'
    // k=2: t=15 has no right at-or-before (right is t=30); k=3 unmatched
    assert(out.toSeq == Seq(
      (1L, 10L, Some("z"), Some("z")),
      (1L, 20L, Some("z"), Some("z")),
      (2L, 15L, None, None),
      (3L, 7L, None, None)))
  }

  test("backward inclusive LEFT: latest right at-or-before; struct-max tie; unmatched kept") {
    setup()
    val out = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t >= r.t " +
      "ORDER BY l.k, l.t").toSeq
    // k=1,t=10: candidates at t=5('b') and two at t=10 ('a','z') -> struct max 'z'
    // k=2,t=15: right only at t=30 -> no match; k=3: no right rows at all
    assert(out == Seq(
      (1L, 10L, Some(10L), Some("z")),
      (1L, 20L, Some(10L), Some("z")),
      (2L, 15L, None, None),
      (3L, 7L, None, None)))
  }

  test("backward strict (>) excludes equal-ts rights; inner drops unmatched") {
    setup()
    val out = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF JOIN asof_r r ON l.k = r.k AND l.t > r.t " +
      "ORDER BY l.k, l.t").toSeq
    // k=1,t=10: only t=5 qualifies under strict; k=2/k=3 unmatched -> dropped (inner)
    assert(out == Seq(
      (1L, 10L, Some(5L), Some("b")),
      (1L, 20L, Some(10L), Some("z"))))
  }

  test("forward (<=): earliest right at-or-after; struct-min tie") {
    setup()
    val out = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t <= r.t " +
      "ORDER BY l.k, l.t").toSeq
    assert(out == Seq(
      (1L, 10L, Some(10L), Some("a")), // equal-ts included, min struct ('a' < 'z')
      (1L, 20L, None, None),
      (2L, 15L, Some(30L), Some("c")),
      (3L, 7L, None, None)))
  }

  test("forward strict (<) excludes equal-ts rights") {
    setup()
    val out = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t < r.t " +
      "ORDER BY l.k, l.t").toSeq
    assert(out.head == ((1L, 10L, None, None))) // t=10 rights no longer qualify
    assert(out(2) == ((2L, 15L, Some(30L), Some("c"))))
  }

  test("reversed operand order in ON normalizes (r.t <= l.t is backward)") {
    setup()
    val a = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON r.k = l.k AND r.t <= l.t ORDER BY l.k, l.t").toSeq
    val b = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t >= r.t ORDER BY l.k, l.t").toSeq
    assert(a == b)
  }

  test("NULL keys and NULL timestamps never match") {
    import spark.implicits._
    Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t").createOrReplaceTempView("asof_ln")
    Seq((Some(1L), Some(5L), "x"), (None, Some(1L), "n"), (Some(1L), None, "m"))
      .toDF("k", "t", "v").createOrReplaceTempView("asof_rn")
    val out = spark.sql(AsofJoinRewrite.rewrite(
      "SELECT l.k, l.t, r.v AS mv FROM asof_ln l ASOF LEFT JOIN asof_rn r " +
      "ON l.k = r.k AND l.t >= r.t", spark)).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (Some(1L), Some(10L), Some("x")), // the only real match
      (None, Some(10L), None),          // null left key
      (Some(1L), None, None)))          // null left ts
  }

  test("collision naming: right columns shadowed by left get <alias>_ prefix; r.* expands") {
    setup()
    val df = spark.sql(AsofJoinRewrite.rewrite(
      "SELECT l.*, r.* FROM asof_l l ASOF LEFT JOIN asof_r r " +
      "ON l.k = r.k AND l.t >= r.t", spark))
    assert(df.columns.toSeq == Seq("k", "t", "amt", "r_k", "r_t", "v"))
    // matched right key equals left key on matched rows
    val m = df.filter("r_k IS NOT NULL").collect()
    assert(m.nonEmpty && m.forall(r => r.getLong(0) == r.getLong(3)))
  }

  test("global (zero-key) ASOF: one ordering over the whole input") {
    setup()
    val out = run("SELECT l.k, l.t, r.t AS mt, r.v AS mv " +
      "FROM asof_l l ASOF LEFT JOIN asof_r r ON l.t >= r.t ORDER BY l.k, l.t").toSeq
    // matches ignore k entirely: every left row takes the latest right t <= its t
    assert(out == Seq(
      (1L, 10L, Some(10L), Some("z")),
      (1L, 20L, Some(10L), Some("z")),
      (2L, 15L, Some(10L), Some("z")),
      (3L, 7L, Some(5L), Some("b"))))
  }

  test("table-name operands without aliases; ASOF composes with a QUALIFY tail") {
    setup()
    val sql = "SELECT asof_l.k, asof_l.t, asof_r.v AS mv FROM asof_l ASOF LEFT JOIN asof_r " +
      "ON asof_l.k = asof_r.k AND asof_l.t >= asof_r.t " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY asof_l.k ORDER BY asof_l.t DESC) = 1 " +
      // unqualified ORDER BY: the QUALIFY desugar wraps the select in a
      // subquery, so outer clauses see output names, not inner qualifiers
      // (same as any QUALIFY statement, with or without ASOF)
      "ORDER BY k"
    val out = spark.sql(Dialect.rewrite(sql, spark)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 20L), (2L, 15L), (3L, 7L))) // latest row per key survives
  }

  test("parity with TemporalJoins oracle shape on the events fixture") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val asof = spark.sql(AsofJoinRewrite.rewrite(
      "SELECT p.event_id, c.ts AS click_ts, c.cv AS click_value " +
      "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
      "ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS cv FROM events " +
      "WHERE event_type = 'click' GROUP BY user_id, ts) c " +
      "ON p.user_id = c.user_id AND p.ts >= c.ts", spark))
    val relational = spark.sql(
      "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "c AS (SELECT user_id, ts, MAX(value) AS cv FROM events WHERE event_type = 'click' GROUP BY user_id, ts), " +
      "m AS (SELECT p.event_id, p.user_id, p.ts, MAX(c.ts) AS click_ts FROM p " +
      "LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts GROUP BY p.event_id, p.user_id, p.ts) " +
      "SELECT m.event_id, m.click_ts, c2.cv AS click_value FROM m " +
      "LEFT JOIN c c2 ON c2.user_id = m.user_id AND c2.ts = m.click_ts")
    assert(asof.count() == relational.count())
    assert(asof.exceptAll(relational).isEmpty && relational.exceptAll(asof).isEmpty)
  }

  test("keyed ASOF desugar plans ONE shuffle — union + window, no pair explosion") {
    setup()
    val df = spark.sql(AsofJoinRewrite.rewrite(
      "SELECT l.k, l.t, r.v AS mv FROM asof_l l ASOF LEFT JOIN asof_r r " +
      "ON l.k = r.k AND l.t >= r.t", spark))
    df.collect()
    // AQE's toString prints Final and Initial sections — count the final only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("declared-unsupported shapes fail loudly") {
    setup()
    def bad(sql: String): String =
      intercept[IllegalArgumentException](AsofJoinRewrite.rewrite(sql, spark)).getMessage
    assert(bad("SELECT 1 FROM asof_l l ASOF JOIN asof_r r ON l.k = r.k")
      .contains("inequality"))
    assert(bad("SELECT 1 FROM asof_l l ASOF JOIN asof_r r ON l.t >= r.t AND l.k > r.k")
      .contains("exactly one inequality"))
    assert(bad("SELECT 1 FROM asof_l l ASOF JOIN asof_r r ON k = r.k AND l.t >= r.t")
      .contains("qualified"))
    assert(bad("SELECT 1 FROM asof_l l ASOF RIGHT JOIN asof_r r ON l.k = r.k AND l.t >= r.t")
      .contains("ASOF LEFT JOIN"))
    assert(bad("SELECT 1 FROM a ASOF JOIN b USING (k, t)").contains("ON clause"))
    assert(bad("SELECT 1 FROM asof_l x ASOF JOIN asof_r x ON x.k = x.k AND x.t >= x.t")
      .contains("distinct aliases"))
    assert(bad("SELECT 1 FROM asof_l l JOIN asof_r q ON l.k = q.k ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.t >= r.t").contains("parenthesized subquery"))
    // reserved working-column names in an operand: clear error, not an
    // ambiguous-reference AnalysisException
    import spark.implicits._
    Seq((1L, 2L, 3L)).toDF("k", "t", "__r").createOrReplaceTempView("asof_res")
    assert(bad("SELECT 1 FROM asof_res l ASOF JOIN asof_r r ON l.k = r.k AND l.t >= r.t")
      .contains("reserved column name"))
  }
}
