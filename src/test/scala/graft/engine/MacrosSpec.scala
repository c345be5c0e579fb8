package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

/** DuckDB CREATE MACRO: session-scoped SQL macros expanded by textual
  * inlining through the statement pipeline (scalar and TABLE forms,
  * defaults, named args, nesting, isolation, role gating).
  */
class MacrosSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def mkSession(role: String = "user") = {
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate(s"macro-$role-${util.Random.nextInt(1 << 20)}", "alice", role)
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    (sessions, session,
      (sql: String) => Statement.run(sessions, session, new GlobalSettings, admission, sql))
  }

  test("scalar macro: positional args, inlined through the pipeline") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO add1(x) AS x + 1")
    val r = run("SELECT add1(n_nationkey) AS k FROM nation ORDER BY k LIMIT 3")
    assert(r.map(_.getAs[Number](0).longValue()).toSeq == Seq(1L, 2L, 3L))
  }

  test("defaults and named-argument calls") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO scaled(x, f := 10) AS x * f")
    assert(run("SELECT scaled(4) AS v").head.getAs[Number](0).longValue() == 40L)
    assert(run("SELECT scaled(4, f := 3) AS v").head.getAs[Number](0).longValue() == 12L)
    // required param missing fails loudly
    val e = intercept[Exception](run("SELECT scaled() AS v"))
    assert(e.getMessage.contains("missing argument"))
  }

  test("a positional argument containing ':=' in a literal stays positional") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO taglen(s) AS length(s)")
    assert(run("SELECT taglen('a := b') AS v").head.getAs[Number](0).longValue() == 6L)
  }

  test("macros may call macros; expansion is depth-capped") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO inc(x) AS x + 1")
    run("CREATE MACRO inc2(x) AS inc(inc(x))")
    assert(run("SELECT inc2(40) AS v").head.getAs[Number](0).longValue() == 42L)
  }

  test("TABLE macro expands to a derived table in FROM") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO big_nations(k) AS TABLE SELECT n_name FROM nation WHERE n_nationkey >= k")
    val r = run("SELECT count(*) AS c FROM big_nations(20)")
    assert(r.head.getAs[Number](0).longValue() == 5L)
  }

  test("substitution hygiene: literals untouched") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO lbl(x) AS concat('x=', cast(x AS STRING))")
    // the literal 'x=' must not have its x substituted
    assert(run("SELECT lbl(7) AS s").head.getString(0) == "x=7")
  }

  test("a macro may not shadow an existing function name (DuckDB parity)") {
    // textual expansion makes shadowing a silent-rewrite hazard: CREATE
    // MACRO sum(x) would rewrite every SUM(...) in the session. DuckDB
    // rejects the collision at creation; so does the engine.
    val (_, _, run) = mkSession()
    for (bad <- Seq("abs", "sum", "upper"))
      assert(intercept[Exception](run(s"CREATE MACRO $bad(x) AS x"))
        .getMessage.contains("collides"), bad)
    // OR REPLACE of a macro this session owns still works (not a collision)
    run("CREATE MACRO own1(x) AS x + 1")
    run("CREATE OR REPLACE MACRO own1(x) AS x + 2")
    assert(run("SELECT own1(1) AS v").head.getAs[Number](0).longValue() == 3L)
    // OR REPLACE does not bypass the builtin check
    assert(intercept[Exception](run("CREATE OR REPLACE MACRO abs(x) AS x"))
      .getMessage.contains("collides"))
    run("DROP MACRO own1")
  }

  test("OR REPLACE, DROP, and unknown-name passthrough") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO m1(x) AS x + 1")
    intercept[Exception](run("CREATE MACRO m1(x) AS x + 2"))
    run("CREATE OR REPLACE MACRO m1(x) AS x + 2")
    assert(run("SELECT m1(1) AS v").head.getAs[Number](0).longValue() == 3L)
    assert(run("DROP MACRO m1").head.getString(0).contains("dropped"))
    // unexpanded call now fails in resolution (not silently wrong)
    intercept[Exception](run("SELECT m1(1) AS v"))
  }

  test("macros are session-scoped") {
    val (_, _, runA) = mkSession()
    runA("CREATE MACRO mine(x) AS x * 2")
    assert(runA("SELECT mine(2) AS v").head.getAs[Number](0).longValue() == 4L)
    val (_, _, runB) = mkSession()
    intercept[Exception](runB("SELECT mine(2) AS v")) // other session: unknown
  }

  test("a macro cannot smuggle a gated construct past the guard") {
    // the reference guard declares it does NOT inspect macro bodies;
    // inlining means the expanded text faces the guard here
    val (_, _, run) = mkSession() // non-admin
    run("CREATE MACRO sneaky() AS TABLE " +
      "SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet')")
    intercept[SecurityException](run("SELECT count(*) AS c FROM sneaky()"))
  }

  test("read-only role blocked from create/drop") {
    val (_, _, run) = mkSession("readonly")
    intercept[SecurityException](run("CREATE MACRO m(x) AS x"))
    intercept[SecurityException](run("DROP MACRO m"))
  }

  test("prepared statements expand macros at prepare time") {
    val (_, session, run) = mkSession()
    run("CREATE MACRO twice(x) AS x * 2")
    val p = session.prepare("SELECT twice(n_nationkey) AS v FROM nation ORDER BY v LIMIT 1")
    val r = session.executePrepared(p.handle).collect()
    assert(r.head.getAs[Number](0).longValue() == 0L)
  }

  test("macro body speaks the dialect (QUALIFY inside a table macro)") {
    val (_, _, run) = mkSession()
    run("CREATE MACRO topn(n) AS TABLE SELECT n_regionkey, n_nationkey FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) <= n")
    assert(run("SELECT count(*) AS c FROM topn(2)").head.getAs[Number](0).longValue() == 10L)
  }
}
