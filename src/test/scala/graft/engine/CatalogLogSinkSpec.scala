package graft.engine

import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Catalog log sink (`/root/reference/src/enterprise/catalog_logging/
  * catalog_log_sink.h:29-41`, behavior contract
  * `tests/integration/test_catalog_logging.cpp`): logs fork into an
  * attached writable catalog's `logs` table; bounded queue drops loudly;
  * failed batches retry per record and never wedge the sink; the catalog is
  * admin-read-only and append-only to SQL clients; DETACH refused while
  * active.
  */
class CatalogLogSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def rec(msg: String, user: String = "alice",
      sessionId: String = "123e4567-e89b-42d3-a456-426614174000"): GraftLog.LogRecord =
    GraftLog.LogRecord(System.currentTimeMillis(), "INFO", msg,
      component = "test", username = user, sessionId = sessionId)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-logsink").toString

  private def awaitCount(catalog: String, want: Long, timeoutMs: Long = 30000): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var n = -1L
    while (n != want && System.currentTimeMillis() < deadline) {
      n = spark.sql(s"SELECT COUNT(*) FROM `$catalog`.logs").collect()(0).getLong(0)
      if (n != want) Thread.sleep(200)
    }
    n
  }

  test("records flow to the catalog under multi-threaded load; promoted " +
      "columns and date partition are real") {
    val sessions = new SessionManager(spark, new GlobalSettings)
    val dir = freshDir()
    val sink = new CatalogLogSink(spark, sessions.attachments, dir,
      catalog = "logsink_flow")
    try {
      GraftLog.registerSink(sink.enqueue)
      val threads = (1 to 4).map { t =>
        new Thread(() => (1 to 50).foreach(i => GraftLog.log(rec(s"m-$t-$i"))))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(awaitCount("logsink_flow", 200) == 200)
      val row = spark.sql(
        "SELECT level, username, session_id, component, log_date FROM " +
          "logsink_flow.logs LIMIT 1").collect()(0)
      assert(row.getString(0) == "INFO" && row.getString(1) == "alice")
      assert(row.getString(2) == "123e4567-e89b-42d3-a456-426614174000")
      assert(row.getString(3) == "test" && row.getDate(4) != null)
      // malformed UUID stores NULL, never poisons the insert
      GraftLog.log(rec("bad-id", sessionId = "not-a-uuid"))
      assert(awaitCount("logsink_flow", 201) == 201)
      val bad = spark.sql(
        "SELECT session_id FROM logsink_flow.logs WHERE message = 'bad-id'").collect()(0)
      assert(bad.isNullAt(0))
      // the partition column is physical: a date dir exists under the table
      val tableDir = new java.io.File(dir, "logs")
      assert(tableDir.listFiles().exists(_.getName.startsWith("log_date=")))
    } finally {
      GraftLog.clearSinks()
      sink.close()
      sessions.attachments.detach(spark, "logsink_flow")
      ()
    }
  }

  test("bounded queue drops (and counts) instead of blocking the logger") {
    val sessions = new SessionManager(spark, new GlobalSettings)
    val sink = new CatalogLogSink(spark, sessions.attachments, freshDir(),
      catalog = "logsink_drop", maxQueueDepth = 4)
    try {
      // a tight enqueue burst outruns the 100 ms writer poll by orders of
      // magnitude: with depth 4, most of these must drop
      (1 to 10000).foreach(i => sink.enqueue(rec(s"burst-$i")))
      assert(sink.droppedCount > 0, "full queue must drop, not block")
      // the sink keeps working afterwards: a post-burst record still lands
      Thread.sleep(500)
      sink.enqueue(rec("after-burst"))
      val deadline = System.currentTimeMillis() + 30000
      var seen = false
      while (!seen && System.currentTimeMillis() < deadline) {
        seen = spark.sql(
          "SELECT COUNT(*) FROM logsink_drop.logs WHERE message = 'after-burst'")
          .collect()(0).getLong(0) == 1
        if (!seen) Thread.sleep(200)
      }
      assert(seen, "the sink keeps accepting and writing after a drop burst")
    } finally {
      sink.close()
      sessions.attachments.detach(spark, "logsink_drop")
      ()
    }
  }

  test("a failing batch neither wedges the writer nor half-commits; the " +
      "sink recovers when the table is back") {
    val sessions = new SessionManager(spark, new GlobalSettings)
    val dir = freshDir()
    val sink = new CatalogLogSink(spark, sessions.attachments, dir,
      catalog = "logsink_fail")
    try {
      sink.enqueue(rec("pre-failure"))
      assert(awaitCount("logsink_fail", 1) == 1)
      // sabotage: drop the table out from under the writer — the batch
      // write and each per-record retry fail; the failure is COUNTED and
      // the writer survives
      spark.sql("DROP TABLE logsink_fail.logs")
      sink.enqueue(rec("lost-1")); sink.enqueue(rec("lost-2"))
      val deadline = System.currentTimeMillis() + 30000
      while (sink.failedCount < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(sink.failedCount == 2)
      // restore the table (same DDL the sink bootstraps) and keep logging
      spark.sql(
        s"""CREATE TABLE logsink_fail.logs (
           |  log_time TIMESTAMP, level STRING, instance_id STRING,
           |  cluster_id STRING, session_id STRING, username STRING,
           |  role STRING, peer STRING, component STRING, trace_id STRING,
           |  span_id STRING, pid INT, tid STRING, source_file STRING,
           |  source_line INT, func STRING, message STRING, fields STRING,
           |  log_date DATE)
           |USING parquet PARTITIONED BY (log_date)
           |LOCATION '${new java.io.File(dir, "logs").getAbsolutePath}'""".stripMargin)
      sink.enqueue(rec("post-recovery"))
      val deadline2 = System.currentTimeMillis() + 30000
      var msgs = Set.empty[String]
      while (!msgs.contains("post-recovery") && System.currentTimeMillis() < deadline2) {
        msgs = spark.sql("SELECT message FROM logsink_fail.logs")
          .collect().map(_.getString(0)).toSet
        if (!msgs.contains("post-recovery")) Thread.sleep(200)
      }
      assert(msgs.contains("post-recovery") && msgs.contains("pre-failure"))
      assert(!msgs.contains("lost-1") && !msgs.contains("lost-2"),
        "failed records are dropped-and-counted, never half-committed")
    } finally {
      sink.close()
      sessions.attachments.detach(spark, "logsink_fail")
      ()
    }
  }

  test("log catalog is admin-read-only, append-only to SQL, and cannot be " +
      "DETACHed while active") {
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    val admin = sessions.getOrCreate("logsink-admin", "alice", "admin")
    val user = sessions.getOrCreate("logsink-user", "bob", "user")
    def run(s: SessionState, sql: String) = Statement.create(sessions, s, global, sql)
    val sink = new CatalogLogSink(spark, sessions.attachments, freshDir(),
      catalog = "logsink_gate")
    try {
      sink.enqueue(rec("gated"))
      assert(awaitCount("logsink_gate", 1) == 1)
      // admin reads fine
      assert(run(admin, "SELECT COUNT(*) AS n FROM logsink_gate.logs")
        .collect()(0).getLong(0) == 1)
      // non-admin read denied — including unqualified after USE
      val e1 = intercept[SecurityException](
        run(user, "SELECT * FROM logsink_gate.logs"))
      assert(e1.getMessage.contains("admin-read-only"))
      run(user, "USE logsink_gate")
      try {
        val e2 = intercept[SecurityException](run(user, "SELECT * FROM logs"))
        assert(e2.getMessage.contains("admin-read-only"))
      } finally run(user, "USE default")
      // SQL writes blocked for EVERYONE (only the sink's writer appends) —
      // the reference's clients get read-only errors on DELETE
      val e3 = intercept[SecurityException](
        run(admin, "DELETE FROM logsink_gate.logs WHERE level = 'INFO'"))
      assert(e3.getMessage.contains("append-only"))
      val e4 = intercept[SecurityException](
        run(admin, "INSERT INTO logsink_gate.logs SELECT * FROM logsink_gate.logs"))
      assert(e4.getMessage.contains("append-only"))
      // DROP/TRUNCATE/ALTER targets parse as UnresolvedTableOrView /
      // UnresolvedTable, not UnresolvedRelation — r16 ADVICE: these
      // bypassed the gate and could destroy the audit log
      // (test_catalog_logging.cpp:181-199)
      for (sql <- Seq(
          "DROP TABLE logsink_gate.logs",
          "TRUNCATE TABLE logsink_gate.logs",
          "ALTER TABLE logsink_gate.logs ADD COLUMN extra STRING")) {
        val ea = intercept[SecurityException](run(admin, sql))
        assert(ea.getMessage.contains("append-only"), sql)
        val eu = intercept[SecurityException](run(user, sql))
        assert(eu.getMessage.contains("admin-read-only") ||
          eu.getMessage.contains("append-only"), sql)
      }
      // r16 ADVICE: after USE, a bare `SELECT ... FROM logs` must still see
      // freshly-appended rows (refresh keyed on the current db, not on the
      // catalog name appearing in the SQL text)
      run(admin, "USE logsink_gate")
      try {
        sink.enqueue(rec("gated-2"))
        val deadline = System.currentTimeMillis() + 30000
        var n = -1L
        while (n != 2 && System.currentTimeMillis() < deadline) {
          n = run(admin, "SELECT COUNT(*) AS n FROM logs").collect()(0).getLong(0)
          if (n != 2) Thread.sleep(200)
        }
        assert(n == 2, "bare-name read after USE served a stale file listing")
      } finally run(admin, "USE default")
      // DETACH refused while the sink is live (test_catalog_logging.cpp:195-199)
      val e5 = intercept[SecurityException](run(admin, "DETACH logsink_gate"))
      assert(e5.getMessage.contains("Cannot DETACH"))
    } finally {
      sink.close()
      // after close, DETACH works again
      assert(run(admin, "DETACH logsink_gate").collect()(0).getString(0)
        .contains("detached"))
    }
  }

  test("removeSink detaches only the given sink — a second server in the " +
      "same JVM keeps its catalog logging when the first closes") {
    val a = new java.util.concurrent.atomic.AtomicInteger(0)
    val b = new java.util.concurrent.atomic.AtomicInteger(0)
    val before = GraftLog.sinkCount
    val ha = GraftLog.registerSink(_ => { a.incrementAndGet(); () })
    val hb = GraftLog.registerSink(_ => { b.incrementAndGet(); () })
    try {
      GraftLog.info("test", "one")
      GraftLog.removeSink(ha)
      GraftLog.info("test", "two")
      assert(a.get == 1, "removed sink must stop receiving")
      assert(b.get == 2, "the other server's sink must keep receiving")
      assert(GraftLog.sinkCount == before + 1)
    } finally GraftLog.removeSink(hb)
  }

  test("recursion guard: a sink logging from inside delivery is not " +
      "re-dispatched into itself") {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    GraftLog.registerSink { _ =>
      seen.incrementAndGet()
      // a sink that logs — without the guard this would recurse forever
      GraftLog.warn("meta", "from inside delivery")
    }
    try {
      GraftLog.info("test", "outer")
      assert(seen.get == 1, "inner record must not re-enter sink delivery")
    } finally GraftLog.clearSinks()
  }
}

/** End-to-end over the wire: a server started with catalogLogDir forks its
  * access log into the attached catalog, queryable by the admin over HTTP
  * (the reference's LogsForkedToCatalog, `test_catalog_logging.cpp:130`).
  */
class CatalogLogServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val secret = "logsink-socket-secret"
  private val password = "pw"

  test("HTTP requests fork structured records into the log catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft-logsink-srv").toString
    val server = new graft.server.GraftHttpServer(spark, secret,
      Auth.hashPassword(secret, password), catalogLogDir = Some(dir))
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
        s"gizmosql_username:$password".getBytes(StandardCharsets.UTF_8))
      val auth = post("/auth", "", "Authorization" -> basic)
      assert(auth.statusCode() == 200)
      val token = auth.body().split("\"token\":\"")(1).split("\"")(0)
      (1 to 3).foreach { _ =>
        assert(post("/sql", "SELECT 1 AS one", "Authorization" -> s"Bearer $token",
          "Accept" -> "application/json").statusCode() == 200)
      }
      // the forked records land asynchronously; poll over the wire
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 4 && System.currentTimeMillis() < deadline) {
        val resp = post("/sql",
          "SELECT COUNT(*) AS n FROM _graft_logs.logs WHERE component = 'http'",
          "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
        if (resp.statusCode() == 200)
          n = "\"n\":(\\d+)".r.findFirstMatchIn(resp.body()).map(_.group(1).toLong).getOrElse(0L)
        if (n < 4) Thread.sleep(300)
      }
      assert(n >= 4, s"expected the /auth + /sql access records in the catalog, got $n")
    } finally {
      server.close()
      ()
    }
  }
}
