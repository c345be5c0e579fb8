package graft.engine

import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Instrumentation into a writable attached catalog
  * (`/root/reference/tests/integration/test_instrumentation_ducklake.cpp:20-27`,
  * table shapes `src/enterprise/instrumentation/instrumentation_manager.cpp:
  * 45-148`): the four reference tables exist in the attached catalog, rows
  * append through the sink protocol, and the catalog carries the full
  * log-catalog protection contract.
  */
class InstrumentationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-instr").toString

  test("sink bootstrap creates the four reference tables; typed emitters " +
      "land rows; catalog is admin-read-only + append-only + DETACH-refused") {
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    val admin = sessions.getOrCreate("instr-admin", "alice", "admin")
    val user = sessions.getOrCreate("instr-user", "bob", "user")
    def run(s: SessionState, sql: String) = Statement.create(sessions, s, global, sql)
    val sink = new InstrumentationSink(spark, sessions.attachments, freshDir(),
      catalog = "instr_gate")
    try {
      for (t <- Seq("instances", "sessions", "sql_statements", "sql_executions"))
        assert(spark.catalog.tableExists(s"instr_gate.$t"), t)
      sink.sessionStart("123e4567-e89b-42d3-a456-426614174000", "inst-1",
        "alice", "admin", "bearer", "127.0.0.1:5", "http", "")
      sink.statement("223e4567-e89b-42d3-a456-426614174000",
        "123e4567-e89b-42d3-a456-426614174000", "SELECT 1", "DoGetStatement",
        isInternal = false, prepareError = "", queryTag = """{"job":"t"}""")
      sink.execution("323e4567-e89b-42d3-a456-426614174000",
        "223e4567-e89b-42d3-a456-426614174000", "success", null,
        rowsFetched = 1L, startMs = 1000L, endMs = 1500L, queryProfile = "")
      assert(sink.flush(), "queue must drain")
      val deadline = System.currentTimeMillis() + 30000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        ok = run(admin,
          """SELECT s.sql_text, e.status, e.rows_fetched, e.duration_ms, s.query_tag
            |FROM instr_gate.sql_statements s
            |JOIN instr_gate.sql_executions e ON e.statement_id = s.statement_id
            |WHERE s.sql_text = 'SELECT 1'""".stripMargin).count() == 1
        if (!ok) Thread.sleep(200)
      }
      assert(ok, "statement + execution rows must join back out of the catalog")
      val row = run(admin,
        """SELECT e.rows_fetched, e.duration_ms FROM instr_gate.sql_statements s
          |JOIN instr_gate.sql_executions e ON e.statement_id = s.statement_id
          |WHERE s.sql_text = 'SELECT 1'""".stripMargin).collect()(0)
      assert(row.getLong(0) == 1L && row.getLong(1) == 500L)
      // full protection contract, inherited via the shared registry
      val e1 = intercept[SecurityException](
        run(user, "SELECT * FROM instr_gate.sessions"))
      assert(e1.getMessage.contains("admin-read-only"))
      val e2 = intercept[SecurityException](
        run(admin, "DELETE FROM instr_gate.sql_executions WHERE status = 'success'"))
      assert(e2.getMessage.contains("append-only"))
      val e3 = intercept[SecurityException](
        run(admin, "DROP TABLE instr_gate.sql_statements"))
      assert(e3.getMessage.contains("append-only"))
      val e4 = intercept[SecurityException](run(admin, "DETACH instr_gate"))
      assert(e4.getMessage.contains("Cannot DETACH"))
    } finally {
      sink.close()
      run(sessions.getOrCreate("instr-admin", "alice", "admin"), "DETACH instr_gate")
      ()
    }
  }
}

/** Wire contract (the r16 verdict's done-criterion): execute SQL over
  * HTTP, then read that statement's instrumentation row back from the
  * attached catalog over the wire as the admin.
  */
class InstrumentationServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("a statement executed over the wire is queryable from the " +
      "instrumentation catalog over the wire") {
    val dir = java.nio.file.Files.createTempDirectory("graft-instr-srv").toString
    val server = new graft.server.GraftHttpServer(spark, "instr-secret",
      Auth.hashPassword("instr-secret", "pw"),
      instanceId = "423e4567-e89b-42d3-a456-426614174000",
      instrumentationDir = Some(dir), unrestrictedLicense = true)
    val port = server.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String, headers: (String, String)*) = {
        val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        headers.foreach { case (k, v) => b.header(k, v) }
        client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val basic = "Basic " + Base64.getEncoder.encodeToString(
        "gizmosql_username:pw".getBytes(StandardCharsets.UTF_8))
      val auth = post("/auth", "", "Authorization" -> basic)
      assert(auth.statusCode() == 200)
      val token = auth.body().split("\"token\":\"")(1).split("\"")(0)
      val marker = "SELECT 41 + 1 AS answer"
      // sql_text stores the REDACTED statement (literals → '?', like the
      // reference's logger): the row to look for is 'SELECT ? + ? AS answer'
      val redacted = "SELECT ? + ? AS answer"
      assert(post("/sql", marker, "Authorization" -> s"Bearer $token",
        "Accept" -> "application/json").statusCode() == 200)
      // instance + session + statement + execution rows, read over the wire
      val deadline = System.currentTimeMillis() + 30000
      var body = ""
      while (!body.contains("\"n\":1") && System.currentTimeMillis() < deadline) {
        val resp = post("/sql",
          s"""SELECT COUNT(*) AS n FROM _graft_instrumentation.sql_statements s
             |JOIN _graft_instrumentation.sql_executions e
             |  ON e.statement_id = s.statement_id
             |WHERE s.sql_text = '$redacted' AND e.status = 'success'
             |  AND e.rows_fetched = 1""".stripMargin,
          "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
        if (resp.statusCode() == 200) body = resp.body()
        if (!body.contains("\"n\":1")) Thread.sleep(300)
      }
      assert(body.contains("\"n\":1"),
        s"statement execution must round-trip through the catalog: $body")
      val inst = post("/sql",
        """SELECT COUNT(*) AS n FROM _graft_instrumentation.instances
          |WHERE status = 'running'""".stripMargin,
        "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
      assert(inst.statusCode() == 200 && inst.body().contains("\"n\":1"), inst.body())
      val sess = post("/sql",
        """SELECT COUNT(*) AS n FROM _graft_instrumentation.sessions
          |WHERE status = 'active' AND username = 'gizmosql_username'""".stripMargin,
        "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
      assert(sess.statusCode() == 200 && sess.body().contains("\"n\":1"), sess.body())
    } finally {
      server.close()
      ()
    }
  }
}
