package graft.tools

import graft.{GraftSession, Tables}
import graft.engine._

/** Executable end-to-end example of the engine-management layer: the same
  * lifecycle a Flight SQL client would drive against the reference server —
  * authenticate (Basic→JWT), open a session, set settings, run gated
  * statements, use pseudo-functions and metadata endpoints, kill a session.
  */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Tables.ensure(spark, dir)

    val secret = "demo-secret"
    val instanceId = "demo-instance"
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    val admission = new AdmissionController(4, 32, 300)

    // 1. Basic auth -> JWT -> session binding, as in the reference middleware.
    val stored = Auth.hashPassword(secret, "gizmosql_password")
    require(Auth.checkBasic(secret, "gizmosql_password", stored))
    val token = Auth.mintToken(secret, "gizmosql_username", "admin", instanceId)
    val id = Auth.validate(secret, token, instanceId).fold(e => sys.error(e), identity)
    println(s"[demo] authenticated ${id.username} role=${id.role} session=${id.sessionId}")

    val session = sessions.getOrCreate(id.sessionId, id.username, id.role)
    Statement.registerPseudoFunctions(session, instanceId, "demo-cluster")
    Statement.refreshSettingsView(session)
    SystemCatalog.install(session.spark)
    Tables.ensure(session.spark, dir)

    // 2. Settings via the SQL front door.
    Statement.run(sessions, session, global, admission, "SET gizmosql.query_tag = 'demo'")
    val tag = Statement.run(sessions, session, global, admission,
      "SELECT value FROM gizmosql_settings WHERE name = 'gizmosql.query_tag'")
    println(s"[demo] query_tag = ${tag.head.getString(0)}")

    // 3. A real query with pseudo-functions mixed in.
    val rows = Statement.run(sessions, session, global, admission,
      "SELECT gizmosql_user() AS who, COUNT(*) AS n FROM lineitem GROUP BY 1")
    println(s"[demo] lineitem count by ${rows.head.getString(0)}: ${rows.head.getLong(1)}")

    // 4. Metadata endpoints.
    println(s"[demo] table_types: " +
      SystemCatalog.tableTypes(session.spark).collect().map(_.getString(0)).mkString(", "))
    println(s"[demo] tables: " +
      SystemCatalog.tables(session.spark, tablePattern = Some("li%")).collect()
        .map(_.getAs[String]("table_name")).mkString(", "))

    // 5. Gating: a readonly session is refused writes.
    val ro = sessions.getOrCreate("ro-1", "bob", "readonly")
    Tables.ensure(ro.spark, dir)
    val refused =
      try { Statement.run(sessions, ro, global, admission, "CREATE TABLE x(i INT) USING parquet"); "NOT BLOCKED" }
      catch { case e: SecurityException => s"blocked: ${e.getMessage}" }
    println(s"[demo] readonly write attempt -> $refused")

    // 6. KILL SESSION is idempotent and tombstones the victim.
    Statement.run(sessions, session, global, admission, "KILL SESSION 'ro-1'")
    println(s"[demo] ro-1 killed=${sessions.isKilled("ro-1")} active=${sessions.active.sorted.mkString(",")}")

    // 7. Result stream as Arrow IPC (the reference's wire format) and bulk
    // ingest of that stream back under each if-exists mode.
    val result = session.spark.sql(
      "SELECT r_regionkey, r_name, named_struct('k', r_regionkey, 'n', r_name) AS st, " +
      "map(r_name, r_regionkey) AS mp FROM region ORDER BY r_regionkey")
    val ipc = graft.sources.ArrowIO.toArrowStream(result)
    println(s"[demo] arrow ipc stream: ${ipc.length} bytes")
    val imported = graft.sources.ArrowIO.fromArrowStream(session.spark, ipc)
    // A previous JVM's managed-table location survives the in-memory
    // catalog reset — clear it or Replace's CREATE fails (the ScaleCheck
    // lesson, LOCATION_ALREADY_EXISTS).
    session.spark.sql("DROP TABLE IF EXISTS demo_regions")
    val whPath = new org.apache.hadoop.fs.Path(
      session.spark.conf.get("spark.sql.warehouse.dir"), "demo_regions")
    whPath.getFileSystem(session.spark.sparkContext.hadoopConfiguration)
      .delete(whPath, true)
    val ing = graft.sources.Ingest.ingest(session.spark, imported, "demo_regions",
      graft.sources.Ingest.IfExists.Replace)
    println(s"[demo] ingested ${ing.rowsIngested} rows into ${ing.table} " +
      s"(count=${session.spark.table("demo_regions").count()})")

    // 8. Prepared statement with typed named parameters.
    val prep = session.prepare("SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity < :q")
    val bound = session.executePrepared(prep.handle, Map("q" -> 10)).collect().head.getLong(0)
    println(s"[demo] prepared(q<10) -> $bound rows")

    // 9. Staged multi-statement transaction: UPDATE inside BEGIN is
    // session-visible, ROLLBACK restores the table untouched.
    Statement.run(sessions, session, global, admission, "DROP TABLE IF EXISTS demo_txn")
    val txnPath = new org.apache.hadoop.fs.Path(
      session.spark.conf.get("spark.sql.warehouse.dir"), "demo_txn")
    txnPath.getFileSystem(session.spark.sparkContext.hadoopConfiguration)
      .delete(txnPath, true)
    Statement.run(sessions, session, global, admission,
      "CREATE TABLE demo_txn USING parquet AS SELECT l_orderkey, l_quantity FROM lineitem LIMIT 100")
    Statement.run(sessions, session, global, admission, "BEGIN")
    val aff = Statement.run(sessions, session, global, admission,
      "UPDATE demo_txn SET l_quantity = 0").head.getLong(0)
    val zeroed = Statement.run(sessions, session, global, admission,
      "SELECT SUM(l_quantity) AS s FROM demo_txn").head.get(0)
    Statement.run(sessions, session, global, admission, "ROLLBACK")
    val restored = Statement.run(sessions, session, global, admission,
      "SELECT SUM(l_quantity) AS s FROM demo_txn").head.get(0)
    println(s"[demo] txn: updated=$aff inTxnSum=$zeroed afterRollbackSum=$restored")
    // Wire-lifecycle handles (the RPC surface) still work standalone.
    val txn = sessions.transactions.begin(session.id)
    println(s"[demo] wire txn $txn commit=${sessions.transactions.commit(txn).isRight}")

    // 10. The DuckDB-dialect migration surface: QUALIFY, SUMMARIZE, PRAGMA,
    // COPY TO, and read_parquet run verbatim through the same pipeline.
    val topPerRegion = Statement.run(sessions, session, global, admission,
      "SELECT n_regionkey, n_name FROM nation " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1 " +
      "ORDER BY n_regionkey")
    println(s"[demo] qualify top-per-region: ${topPerRegion.length} rows")
    val summarized = Statement.run(sessions, session, global, admission, "SUMMARIZE nation")
    println(s"[demo] summarize nation: ${summarized.length} column profiles")
    val pragma = Statement.run(sessions, session, global, admission, "PRAGMA database_list")
    println(s"[demo] pragma database_list: ${pragma.map(_.getString(1)).mkString(",")}")
    val copyDir = java.nio.file.Files.createTempDirectory("graft-demo-copy").toString
    val copied = Statement.run(sessions, session, global, admission,
      s"COPY (SELECT * EXCLUDE (n_name) FROM nation) TO '$copyDir/n.parquet' (FORMAT PARQUET)")
      .head.getLong(0)
    val readBack = Statement.run(sessions, session, global, admission,
      s"SELECT COUNT(*) AS n FROM read_parquet('$copyDir/n.parquet')").head.getLong(0)
    println(s"[demo] copy-to/read_parquet round-trip: $copied written, $readBack read")

    // 10b. The round-7 dialect widening: FROM-first, DESCRIBE, PIVOT,
    // ASOF JOIN, macros, list comprehensions, star REPLACE, USING SAMPLE.
    val ff = Statement.run(sessions, session, global, admission,
      "FROM nation SELECT n_name WHERE n_regionkey = 0 ORDER BY n_name")
    println(s"[demo] from-first: ${ff.length} rows")
    val described = Statement.run(sessions, session, global, admission, "DESCRIBE nation")
    println(s"[demo] describe nation: ${described.map(_.getString(0)).mkString(",")}")
    val pivoted = Statement.run(sessions, session, global, admission,
      "PIVOT nation ON n_regionkey USING count(*)")
    println(s"[demo] pivot statement: ${pivoted.length} rows wide-by-region")
    Statement.run(sessions, session, global, admission,
      "CREATE MACRO key_bucket(k, n := 4) AS k % n")
    val macroRows = Statement.run(sessions, session, global, admission,
      "SELECT key_bucket(n_nationkey) AS b, count(*) AS c FROM nation GROUP BY b ORDER BY b")
    println(s"[demo] macro key_bucket: ${macroRows.length} buckets")
    val asof = Statement.run(sessions, session, global, admission,
      "SELECT p.event_id, c.ts AS click_ts FROM " +
      "(SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
      "ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c " +
      "ON p.user_id = c.user_id AND p.ts >= c.ts LIMIT 5")
    println(s"[demo] asof join sql: ${asof.length} rows")
    val compr = Statement.run(sessions, session, global, admission,
      "SELECT [upper(t) FOR t IN string_split(n_name, ' ')] AS words FROM nation LIMIT 1")
    println(s"[demo] list comprehension: ${compr.length} row")
    val repl = Statement.run(sessions, session, global, admission,
      "SELECT * EXCLUDE (n_name) REPLACE (n_regionkey + 100 AS n_regionkey) FROM nation LIMIT 1")
    println(s"[demo] star replace: regionkey+100=${repl.head.getAs[Number]("n_regionkey")}")
    val sampled = Statement.run(sessions, session, global, admission,
      "SELECT count(*) AS c FROM lineitem USING SAMPLE 50 ROWS").head.getLong(0)
    println(s"[demo] using sample: $sampled rows")

    // 11. Health + graceful drain.
    val health = new Health(spark).start()
    println(s"[demo] health=${health.status}")
    health.close()
    val sd = new ShutdownState(30)
    sd.signal()
    println(s"[demo] drain: new work admitted=${sd.admitNew().isRight} drained=${sd.drained}")

    spark.stop()
  }
}
