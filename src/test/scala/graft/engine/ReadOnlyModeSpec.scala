package graft.engine

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Server-wide read-only mode (reference `test_read_only_mode.cpp`): every
  * session — admin included — is read-only; reads and the system catalog
  * keep working, writes are refused.
  */
class ReadOnlyModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("read-only mode: reads + metadata work for everyone, writes refused " +
      "even for admin; turning it off restores writes") {
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    sessions.readOnlyMode = true
    val admin = sessions.getOrCreate("romode-admin", "alice", "admin")
    def run(sql: String) = Statement.create(sessions, admin, global, sql)
    assert(run("SELECT 1 AS v").collect()(0).getInt(0) == 1)
    assert(run("SHOW TABLES").collect() != null, "system catalog stays queryable")
    val e = intercept[SecurityException](
      run("CREATE TABLE romode_t (a INT)"))
    assert(e.getMessage.contains("read-only"))
    val e2 = intercept[SecurityException](
      run("INSERT INTO nosuch VALUES (1)"))
    assert(e2.getMessage.contains("read-only"))
    // flipping the mode applies to EXISTING sessions on their next statement
    sessions.readOnlyMode = false
    sessions.getOrCreate("romode-admin", "alice", "admin") // refresh flag
    run("CREATE TABLE romode_t (a INT)")
    try {
      run("INSERT INTO romode_t VALUES (1)")
      assert(run("SELECT COUNT(*) AS n FROM romode_t").collect()(0).getLong(0) == 1)
    } finally run("DROP TABLE IF EXISTS romode_t")
  }
}
