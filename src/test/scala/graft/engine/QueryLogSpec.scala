package graft.engine

import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Query/auth log-level semantics (reference
  * `test_set_query_log_level.cpp`, `test_internal_query_log_level.cpp`,
  * `test_log_level_filtering.cpp`, `test_auth_log_level.cpp`): statements
  * log at their NATURAL severity, suppressed — never promoted — below the
  * component threshold; internal metadata queries are DEBUG; both the
  * component threshold and the overall logger threshold must pass; repeat
  * bearer validations are DEBUG while first-seen are INFO.
  */
class QueryLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private lazy val global = new GlobalSettings
  private lazy val sessions = new SessionManager(spark, global)
  private lazy val admin = sessions.getOrCreate("qlog-admin", "alice", "admin")

  private def run(s: SessionState, sql: String) =
    Statement.create(sessions, s, global, sql)

  private def captured[T](f: mutable.Buffer[GraftLog.LogRecord] => T): T = {
    val buf = mutable.Buffer.empty[GraftLog.LogRecord]
    GraftLog.registerSink(r => buf.synchronized { buf += r; () })
    try f(buf) finally GraftLog.clearSinks()
  }

  test("client statement logs an INFO attempt record with redacted SQL") {
    captured { buf =>
      run(admin, "SELECT 'secret-literal' AS v").collect()
      val recs = buf.filter(r => r.component == "query" &&
        r.fieldsJson.contains("\"is_internal\":\"false\""))
      assert(recs.nonEmpty)
      val r = recs.last
      assert(r.level == "INFO" && r.username == "alice" && r.sessionId == "qlog-admin")
      assert(r.fieldsJson.contains("'?'") && !r.fieldsJson.contains("secret-literal"),
        "SQL literals must be redacted in the log")
    }
  }

  test("session SET query_log_level='error' suppresses (not promotes) " +
      "INFO attempts; resetting restores them") {
    run(admin, "SET gizmosql.query_log_level = 'error'")
    try captured { buf =>
      run(admin, "SELECT 1 AS suppressed_probe").collect()
      assert(!buf.exists(_.fieldsJson.contains("suppressed_probe")),
        "INFO attempt must be suppressed below an error threshold")
    } finally run(admin, "SET gizmosql.query_log_level = 'info'")
    captured { buf =>
      run(admin, "SELECT 1 AS visible_probe").collect()
      assert(buf.exists(_.fieldsJson.contains("visible_probe")))
    }
  }

  test("a debug threshold does NOT promote client statements — severity " +
      "stays INFO (issue-136 regression shape)") {
    run(admin, "SET gizmosql.query_log_level = 'debug'")
    try captured { buf =>
      run(admin, "SELECT 2 AS nat_probe").collect()
      val r = buf.filter(_.fieldsJson.contains("nat_probe"))
      assert(r.nonEmpty && r.forall(_.level == "INFO"),
        "natural severity is preserved, never promoted to the threshold")
    } finally run(admin, "SET gizmosql.query_log_level = 'info'")
  }

  test("GetTables is an INTERNAL query: invisible at info, visible at debug " +
      "with is_internal=true") {
    captured { buf =>
      FlightSurface.tablesWithSchema(admin, None).collect()
      assert(!buf.exists(_.fieldsJson.contains("GetTables")),
        "internal metadata queries must not log at the info threshold")
    }
    run(admin, "SET gizmosql.query_log_level = 'debug'")
    try captured { buf =>
      FlightSurface.tablesWithSchema(admin, None).collect()
      val r = buf.filter(_.fieldsJson.contains("GetTables"))
      assert(r.nonEmpty && r.forall(x =>
        x.level == "DEBUG" && x.fieldsJson.contains("\"is_internal\":\"true\"")))
    } finally run(admin, "SET gizmosql.query_log_level = 'info'")
  }

  test("SET GLOBAL propagates immediately to sessions without an override") {
    assert(global.set("gizmosql.query_log_level", "error", isAdmin = true).isRight)
    try {
      val fresh = sessions.getOrCreate("qlog-fresh", "bob", "user")
      captured { buf =>
        run(fresh, "SELECT 3 AS global_probe").collect()
        assert(!buf.exists(_.fieldsJson.contains("global_probe")),
          "a session without a session-level override reads the global threshold")
      }
    } finally { global.set("gizmosql.query_log_level", "info", isAdmin = true); () }
  }

  test("both thresholds must be satisfied: the overall logger gate drops " +
      "what the component threshold admits") {
    val prev = GraftLog.overallThreshold
    GraftLog.overallThreshold = "error"
    try captured { buf =>
      run(admin, "SELECT 4 AS overall_probe").collect()
      assert(!buf.exists(_.fieldsJson.contains("overall_probe")))
    } finally GraftLog.overallThreshold = prev
  }
}

/** Auth log level over the wire: first-seen token validations log INFO,
  * repeats DEBUG — suppressed at the default info threshold, visible after
  * SET GLOBAL auth_log_level='debug' (`test_auth_log_level.cpp`).
  */
class AuthLogLevelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val secret = "qlog-auth-secret"
  private val password = "pw"

  test("repeat bearer validations suppressed at info; visible at debug") {
    val server = new graft.server.GraftHttpServer(spark, secret,
      Auth.hashPassword(secret, password))
    val port = server.start()
    val buf = scala.collection.mutable.Buffer.empty[GraftLog.LogRecord]
    GraftLog.registerSink(r =>
      if (r.component == "auth") buf.synchronized { buf += r; () })
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
        s"gizmosql_username:$password".getBytes(StandardCharsets.UTF_8))
      val token = post("/auth", "", "Authorization" -> basic)
        .body().split("\"token\":\"")(1).split("\"")(0)
      (1 to 3).foreach { _ =>
        assert(post("/sql", "SELECT 1 AS one", "Authorization" -> s"Bearer $token",
          "Accept" -> "application/json").statusCode() == 200)
      }
      val firstPhase = buf.synchronized { buf.toList }
      assert(firstPhase.count(_.fieldsJson.contains("first_seen")) == 1,
        "exactly one first-seen INFO record")
      assert(!firstPhase.exists(_.fieldsJson.contains("repeat")),
        "repeat validations are DEBUG — suppressed at the info threshold")
      // raise the component threshold floor to debug: repeats now log
      assert(server.global.set("gizmosql.auth_log_level", "debug", isAdmin = true).isRight)
      assert(post("/sql", "SELECT 2 AS two", "Authorization" -> s"Bearer $token",
        "Accept" -> "application/json").statusCode() == 200)
      val second = buf.synchronized { buf.toList }
      assert(second.exists(r => r.fieldsJson.contains("repeat") && r.level == "DEBUG"),
        "repeat validations surface at a debug threshold, at their natural DEBUG severity")
    } finally {
      GraftLog.clearSinks()
      server.close()
    }
  }
}
