package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** Staged multi-statement transactions: read-your-writes inside the
  * session, durable apply on COMMIT, full discard on ROLLBACK, eager
  * non-DML commands rejected while a transaction is open.
  */
class TxnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private lazy val global = new GlobalSettings
  private lazy val sessions = new SessionManager(spark, global)

  private def run(s: SessionState, sql: String) =
    Statement.create(sessions, s, global, sql)

  private def fresh(s: SessionState, table: String): Unit = {
    s.spark.sql(s"DROP TABLE IF EXISTS $table")
    s.spark.sql(s"CREATE TABLE $table USING parquet AS " +
      "SELECT id, CAST(v AS DOUBLE) AS v FROM VALUES (1, 10.0), (2, 20.0), (3, 30.0) AS t(id, v)")
  }

  private def vs(s: SessionState, table: String): Seq[Double] =
    s.spark.table(table).orderBy("id").collect().map(_.getDouble(1)).toSeq

  test("rollback discards staged updates; the table never changed") {
    val s = sessions.getOrCreate("txn-s1", "alice", "admin")
    fresh(s, "txn_t1")
    run(s, "BEGIN")
    val affected = run(s, "UPDATE txn_t1 SET v = v * 2 WHERE id <= 2")
      .collect().head.getLong(0)
    assert(affected == 2)
    // Read-your-writes inside the session...
    assert(vs(s, "txn_t1") == Seq(20.0, 40.0, 30.0))
    // ...while another session reads the committed table.
    val other = sessions.getOrCreate("txn-s1b", "bob", "admin")
    assert(vs(other, "txn_t1") == Seq(10.0, 20.0, 30.0))
    run(s, "ROLLBACK")
    assert(vs(s, "txn_t1") == Seq(10.0, 20.0, 30.0))
    assert(s.activeTxn.isEmpty)
  }

  test("commit applies the final state of multiple statements atomically per table") {
    val s = sessions.getOrCreate("txn-s2", "alice", "admin")
    fresh(s, "txn_t2")
    run(s, "BEGIN TRANSACTION")
    run(s, "UPDATE txn_t2 SET v = v + 1")
    run(s, "DELETE FROM txn_t2 WHERE id = 3")
    // Second statement saw the first's writes (v already +1).
    assert(vs(s, "txn_t2") == Seq(11.0, 21.0))
    val res = run(s, "COMMIT").collect().head.getString(0)
    assert(res.contains("committed (1 tables)"))
    // Durable: a fresh session sees the final state.
    val other = sessions.getOrCreate("txn-s2b", "bob", "admin")
    assert(vs(other, "txn_t2") == Seq(11.0, 21.0))
  }

  test("merge inside a transaction stages and commits") {
    val s = sessions.getOrCreate("txn-s3", "alice", "admin")
    fresh(s, "txn_t3")
    s.spark.sql("DROP TABLE IF EXISTS txn_src3")
    s.spark.sql("CREATE TABLE txn_src3 USING parquet AS " +
      "SELECT id, CAST(v AS DOUBLE) AS v FROM VALUES (2, 200.0), (4, 400.0) AS t(id, v)")
    run(s, "BEGIN")
    run(s, "MERGE INTO txn_t3 t USING txn_src3 s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    assert(vs(s, "txn_t3") == Seq(10.0, 200.0, 30.0, 400.0))
    run(s, "ROLLBACK")
    assert(vs(s, "txn_t3") == Seq(10.0, 20.0, 30.0))
  }

  test("non-DML commands are rejected inside a transaction, before executing") {
    val s = sessions.getOrCreate("txn-s4", "alice", "admin")
    fresh(s, "txn_t4")
    run(s, "BEGIN")
    val e = intercept[IllegalArgumentException](
      run(s, "INSERT INTO txn_t4 VALUES (9, 90.0)"))
    assert(e.getMessage.contains("transactional"))
    // The rejected INSERT must not have applied.
    assert(vs(s, "txn_t4") == Seq(10.0, 20.0, 30.0))
    val e2 = intercept[IllegalArgumentException](
      run(s, "CREATE TABLE txn_t4b(x INT) USING parquet"))
    assert(e2.getMessage.contains("transactional"))
    assert(!s.spark.catalog.tableExists("txn_t4b"))
    // Pure SELECTs still run.
    assert(run(s, "SELECT COUNT(*) AS c FROM txn_t4").collect().head.getLong(0) == 3)
    run(s, "ROLLBACK")
  }

  test("lifecycle errors: nesting, commit/rollback without a transaction") {
    val s = sessions.getOrCreate("txn-s5", "alice", "admin")
    intercept[IllegalArgumentException](run(s, "COMMIT"))
    intercept[IllegalArgumentException](run(s, "ROLLBACK"))
    run(s, "BEGIN")
    intercept[IllegalArgumentException](run(s, "BEGIN"))
    run(s, "ROLLBACK")
  }
}
