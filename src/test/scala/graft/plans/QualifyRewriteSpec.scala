package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class QualifyRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("no-op without a top-level QUALIFY; literals and subqueries untouched") {
    val plain = "SELECT 1 AS a FROM region"
    assert(QualifyRewrite.rewrite(plain) == plain)
    val inLiteral = "SELECT 'use QUALIFY here' AS s FROM region"
    assert(QualifyRewrite.rewrite(inLiteral) == inLiteral)
    val inSubquery = "SELECT * FROM (SELECT r_regionkey FROM region) t"
    assert(QualifyRewrite.rewrite(inSubquery) == inSubquery)
  }

  test("inline window predicate: per-group top-k via QUALIFY") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val sql = "SELECT n_regionkey, n_nationkey FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) <= 2 " +
      "ORDER BY n_regionkey, n_nationkey"
    val out = spark.sql(QualifyRewrite.rewrite(sql)).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
    assert(out.length == 10) // 5 regions x top 2
    assert(out.groupBy(_._1).forall(_._2.length == 2))
    // the marker column must not leak into the result
    assert(!spark.sql(QualifyRewrite.rewrite(sql)).columns.contains("__qualify_p"))
  }

  test("alias-referencing predicate resolves through lateral column alias") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val sql = "SELECT n_regionkey, n_nationkey, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC) AS INTEGER) AS rn " +
      "FROM nation QUALIFY rn = 1 ORDER BY n_regionkey"
    val out = spark.sql(QualifyRewrite.rewrite(sql)).collect()
    assert(out.length == 5)
    assert(out.forall(_.getInt(2) == 1))
  }

  test("unsupported shapes fail loudly, not silently wrong") {
    intercept[IllegalArgumentException] {
      QualifyRewrite.rewrite("SELECT a FROM t UNION SELECT a FROM u QUALIFY a > 1")
    }
    intercept[IllegalArgumentException] {
      QualifyRewrite.rewrite("SELECT DISTINCT a FROM t QUALIFY a > 1")
    }
    // but IS DISTINCT FROM elsewhere must not false-trigger
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val ok = QualifyRewrite.rewrite(
      "SELECT n_regionkey, n_nationkey FROM nation WHERE n_name IS DISTINCT FROM 'x' " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1")
    assert(spark.sql(ok).count() == 5)
  }

  test("star EXCLUDE rewrites to EXCEPT, parens added when absent") {
    assert(StarExclude.rewrite("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(StarExclude.rewrite("SELECT * EXCLUDE a FROM t") ==
      "SELECT * EXCEPT (a) FROM t")
    assert(StarExclude.rewrite("SELECT 'keep EXCLUDE here' AS s FROM t") ==
      "SELECT 'keep EXCLUDE here' AS s FROM t")
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val out = spark.sql(StarExclude.rewrite(
      "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey LIMIT 1"))
    assert(!out.columns.contains("n_name") && out.columns.contains("n_regionkey"))
  }

  test("EXCLUDE composes with QUALIFY (star-EXCEPT is not a set operation)") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val sql = "SELECT * EXCLUDE (n_name) FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1 " +
      "ORDER BY n_regionkey"
    val out = spark.sql(QualifyRewrite.rewrite(StarExclude.rewrite(sql)))
    assert(out.count() == 5 && !out.columns.contains("n_name"))
  }

  test("QUALIFY flows through the statement pipeline") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("qualify-s", "alice", "admin")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    val rows = Statement.run(sessions, session, new GlobalSettings, admission,
      "SELECT n_regionkey, n_nationkey FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1 " +
      "ORDER BY n_regionkey")
    assert(rows.length == 5)
  }

  test("PRAGMA version / database_list / show_tables / table_info") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("pragma-s", "alice", "user") // non-admin: ungated
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    def run(sql: String) = Statement.run(sessions, session, new GlobalSettings, admission, sql)

    val v = run("PRAGMA version")
    assert(v.length == 1 && v(0).getString(0).nonEmpty)
    val dbs = run("PRAGMA database_list")
    assert(dbs.map(_.getString(1)).contains("spark_catalog"))
    val tabs = run("PRAGMA show_tables").map(_.getString(0))
    assert(tabs.contains("nation") && tabs.contains("lineitem"))
    val ti = run("PRAGMA table_info('nation')")
    assert(ti.map(_.getString(1)).contains("n_nationkey"))
    assert(ti.forall(r => r.getString(2).nonEmpty))
  }

  test("DESCRIBE / SHOW statement family returns DuckDB's shapes") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("desc-s", "alice", "user") // non-admin: ungated metadata
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    def run(sql: String) = Statement.run(sessions, session, new GlobalSettings, admission, sql)
    def runDf(sql: String) = Statement.create(sessions, session, new GlobalSettings, sql)

    // DESCRIBE <table>: DuckDB's six columns, VARCHAR spelling for strings
    val d = runDf("DESCRIBE nation")
    assert(d.columns.toSeq == Seq("column_name", "column_type", "null", "key", "default", "extra"))
    val byName = d.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("n_name") == "VARCHAR")
    assert(Set("INTEGER", "BIGINT").contains(byName("n_nationkey")))
    // SHOW <table> is the same report; DESC abbreviation works
    assert(run("SHOW nation").length == run("DESC nation").length)

    // DESCRIBE <query>: schema from analysis only (dialect-rewritten)
    val dq = runDf("DESCRIBE SELECT n_nationkey + 1 AS k, upper(n_name) AS u FROM nation")
    assert(dq.collect().map(_.getString(0)).toSeq == Seq("k", "u"))

    // SHOW TABLES single-column; SHOW ALL TABLES carries column lists
    val tabs = run("SHOW TABLES").map(_.getString(0))
    assert(tabs.contains("nation") && tabs.contains("lineitem"))
    val all = runDf("SHOW ALL TABLES").collect()
    val nat = all.find(_.getAs[String]("name") == "nation").get
    assert(nat.getAs[scala.collection.Seq[String]]("column_names").contains("n_name"))
    assert(nat.getAs[scala.collection.Seq[String]]("column_types").contains("VARCHAR"))

    // Spark's own SHOW keywords are NOT intercepted
    assert(run("SHOW DATABASES").nonEmpty)
    // non-admin DESCRIBE of a local path scan is blocked by the guard
    intercept[SecurityException](
      run("DESCRIBE SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`"))
  }

  test("EXPLAIN ANALYZE and prepared statements face the guard") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("guard-s", "alice", "user")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    def run(sql: String) = Statement.run(sessions, session, new GlobalSettings, admission, sql)
    // EXPLAIN ANALYZE executes — a non-admin local scan is blocked, not run
    intercept[SecurityException](
      run("EXPLAIN ANALYZE SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`"))
    // read-only role: a write can't slip through the EXPLAIN ANALYZE arm
    val ro = sessions.getOrCreate("guard-ro", "bob", "readonly")
    Tables.ensure(ro.spark, SparkTestHarness.sfDir)
    intercept[SecurityException](Statement.run(sessions, ro, new GlobalSettings, admission,
      "EXPLAIN ANALYZE CREATE TABLE guard_t (x INT) USING parquet"))
    // prepare rejects a blocked statement AT PREPARE TIME (executePrepared
    // runs the stored text directly, so this is the enforcement point)
    intercept[SecurityException](
      session.prepare("SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`"))
    // ordinary statements still prepare fine
    assert(session.prepare("SELECT 1 AS x").schema.isDefined)
  }

  test("read_parquet table function rewrites to the path-scan form; guard intact") {
    assert(TableFunctions.rewrite("SELECT * FROM read_parquet('/x/y.parquet')") ==
      "SELECT * FROM parquet.`/x/y.parquet`")
    assert(TableFunctions.rewrite("SELECT * FROM READ_CSV_AUTO('/d/*.csv')") ==
      "SELECT * FROM csv.`/d/*.csv`")
    // literal containing the text is untouched
    val lit = "SELECT 'use read_parquet(''f'')' AS s"
    assert(TableFunctions.rewrite(lit) == lit)

    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val admission = new AdmissionController(4, 8, 30)
    val admin = sessions.getOrCreate("rp-a", "alice", "admin")
    val rows = Statement.run(sessions, admin, new GlobalSettings, admission,
      s"SELECT COUNT(*) AS n FROM read_parquet('${SparkTestHarness.sfDir}/region.parquet')")
    assert(rows(0).getLong(0) == 5)
    // non-admin local-path scan stays blocked: the guard sees the rewritten
    // parquet.`...` form and applies its existing rule
    val user = sessions.getOrCreate("rp-u", "bob", "user")
    intercept[SecurityException] {
      Statement.run(sessions, user, new GlobalSettings, admission,
        s"SELECT COUNT(*) AS n FROM read_parquet('${SparkTestHarness.sfDir}/region.parquet')")
    }
  }

  test("COPY ... TO writes parquet/csv and returns the copied row count") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val admin = sessions.getOrCreate("copy-s", "alice", "admin")
    Tables.ensure(admin.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    def run(s: SessionState, sql: String) =
      Statement.run(sessions, s, new GlobalSettings, admission, sql)

    val dir = java.nio.file.Files.createTempDirectory("graft-copy").toString
    val r1 = run(admin, s"COPY (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0) TO '$dir/af.parquet' (FORMAT PARQUET)")
    assert(r1(0).getLong(0) == 5)
    assert(spark.read.parquet(s"$dir/af.parquet").count() == 5)

    val r2 = run(admin, s"COPY region TO '$dir/region_csv' (FORMAT CSV, HEADER)")
    assert(r2(0).getLong(0) == 5)
    val back = spark.read.option("header", "true").csv(s"$dir/region_csv")
    assert(back.count() == 5 && back.columns.contains("r_name"))

    val user = sessions.getOrCreate("copy-u", "bob", "user")
    intercept[SecurityException] {
      run(user, s"COPY region TO '$dir/nope' (FORMAT PARQUET)")
    }
  }

  test("EXPLAIN ANALYZE returns the executed plan with metrics") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("ea-s", "alice", "user")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    val lines = Statement.run(sessions, session, new GlobalSettings, admission,
      "EXPLAIN ANALYZE SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey")
      .map(_.getString(0))
    assert(lines.exists(_.contains("HashAggregate")))
    // executed (not just planned): AQE finalization marker present
    assert(lines.mkString("\n").contains("AdaptiveSparkPlan isFinalPlan=true"))
  }

  test("EXPLAIN ANALYZE of a wide result never materializes rows on the driver") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("ea-wide", "alice", "user")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    // ~150k-row cross join at the test SF (row count scales with the
    // fixture, unbounded at real SF); execution drains on the executors,
    // and the returned payload is PLAN LINES, bounded by plan size, not
    // result size
    val lines = Statement.run(sessions, session, new GlobalSettings, admission,
      "EXPLAIN ANALYZE SELECT a.l_orderkey FROM lineitem a CROSS JOIN nation")
      .map(_.getString(0))
    assert(lines.length < 200, s"payload must be the plan, got ${lines.length} rows")
    assert(lines.mkString("\n").contains("isFinalPlan=true"))
  }

  test("prepared statements speak the dialect too") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("prep-dialect", "alice", "admin")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val p = session.prepare(
      "SELECT n_regionkey, n_nationkey FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1")
    assert(p.schema.exists(_.fieldNames.contains("n_nationkey")))
    assert(session.executePrepared(p.handle).count() == 5)
  }

  test("SUMMARIZE produces DuckDB's report shape with sane statistics") {
    import graft.engine._
    val sessions = new SessionManager(spark, new GlobalSettings)
    val session = sessions.getOrCreate("summarize-s", "alice", "user")
    Tables.ensure(session.spark, SparkTestHarness.sfDir)
    val admission = new AdmissionController(4, 8, 30)
    val rows = Statement.run(sessions, session, new GlobalSettings, admission,
      "SUMMARIZE documents")
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val docId = byName("doc_id")
    // columns: name, type, min, max, approx_unique, avg, std, q25, q50, q75, count, null%
    assert(docId.getString(2) == "0")
    assert(docId.getString(5) != null && docId.getString(7) != null) // numeric stats present
    assert(docId.getDouble(11) == 0.0)
    val text = byName("text")
    assert(text.getString(5) == null) // no avg for strings, like DuckDB
    assert(text.getLong(10) == session.spark.table("documents").count())
    // array columns don't break the wide aggregate: min/max/avg are null
    // (non-orderable), distinct-count and count still report
    val emb = Statement.run(sessions, session, new GlobalSettings, admission,
      "SUMMARIZE embeddings").map(r => r.getString(0) -> r).toMap
    assert(emb.contains("embedding"))
    assert(emb("embedding").getString(2) == null && emb("embedding").getLong(10) > 0)
    // DuckDB's query form: SUMMARIZE SELECT ... (inner query speaks the
    // dialect and faces the guard)
    val q = Statement.run(sessions, session, new GlobalSettings, admission,
      "SUMMARIZE SELECT n_chars, source FROM documents WHERE doc_id < 100")
      .map(r => r.getString(0) -> r).toMap
    assert(q.keySet == Set("n_chars", "source"))
    assert(q("n_chars").getLong(10) == 100)
    intercept[SecurityException](Statement.run(sessions, session, new GlobalSettings,
      admission, "SUMMARIZE SELECT * FROM parquet.`/etc`"))
  }
}
