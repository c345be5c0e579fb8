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

  test("multi-table commit applies every touched table and clears its journal") {
    val s = sessions.getOrCreate("txn-s6", "alice", "admin")
    fresh(s, "txn_t6a"); fresh(s, "txn_t6b")
    def stagedDirs: Set[String] = {
      val stage = TxnJournal.stageRoot(s.spark)
      if (!java.nio.file.Files.isDirectory(stage)) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(stage).iterator().asScala.map(_.toString).toSet
      }
    }
    val preexisting = stagedDirs // earlier rollback tests defer their sweep
    // snapshot deletion is tombstone+grace in production; zero grace makes
    // the leak assertion immediate here
    s.spark.conf.set("spark.graft.txn.snapshotGraceMs", "0")
    run(s, "BEGIN")
    run(s, "UPDATE txn_t6a SET v = v * 10")
    run(s, "DELETE FROM txn_t6b WHERE id > 1")
    val res = run(s, "COMMIT").collect().head.getString(0)
    assert(res.contains("committed (2 tables)"))
    assert(vs(s, "txn_t6a") == Seq(100.0, 200.0, 300.0))
    assert(vs(s, "txn_t6b") == Seq(10.0))
    // Completed commit leaves no journal behind.
    val dir = TxnJournal.journalDir(s.spark)
    assert(!java.nio.file.Files.isDirectory(dir) ||
      !java.nio.file.Files.list(dir).iterator().hasNext)
    // ... and no staging dirs either: they live under the warehouse (no
    // tmpdir reaper), so an un-deleted post-image is a permanent per-txn
    // disk leak on a long-running server. (Dirs left by EARLIER tests'
    // deliberate rollback-defer are excluded — only this commit's dirs
    // must be gone.)
    assert((stagedDirs -- preexisting).isEmpty,
      "commit must delete its staging dirs")
  }

  test("rolled-back staging dirs are swept at the next bootstrap recover") {
    val s = sessions.getOrCreate("txn-s6c", "alice", "admin")
    fresh(s, "txn_t6c")
    run(s, "BEGIN")
    run(s, "UPDATE txn_t6c SET v = v * 10")
    val stage = TxnJournal.stageRoot(s.spark)
    assert(java.nio.file.Files.list(stage).iterator().hasNext,
      "staged post-image expected while the txn is open")
    run(s, "ROLLBACK")
    // rollback defers deletion (an in-flight scan may hold the shadow);
    // bootstrap recovery sweeps every dir no live journal references
    TxnJournal.recover(s.spark)
    assert(!java.nio.file.Files.isDirectory(stage) ||
      !java.nio.file.Files.list(stage).iterator().hasNext,
      "recover must sweep orphaned staging dirs")
  }

  test("journal redo completes an interrupted multi-table commit") {
    val s = sessions.getOrCreate("txn-s7", "alice", "admin")
    fresh(s, "txn_t7a"); fresh(s, "txn_t7b")
    // Post-images as a crashed commit would have staged them.
    val root = TxnJournal.stageRoot(s.spark)
    def stagePostImage(table: String, sql: String): String = {
      val dir = root.resolve(java.util.UUID.randomUUID().toString).toString
      s.spark.sql(sql).write.parquet(dir)
      dir
    }
    val d7a = stagePostImage("txn_t7a", "SELECT id, v * 2 AS v FROM txn_t7a")
    val d7b = stagePostImage("txn_t7b", "SELECT id, v + 5 AS v FROM txn_t7b")
    val j = TxnJournal.write(s.spark, "txn-crash-7", Seq("txn_t7a" -> d7a, "txn_t7b" -> d7b))
    // Simulate a crash after the FIRST table applied: redo must finish the
    // second AND harmlessly re-apply the first (entries are full post-images).
    s.spark.read.parquet(d7a).write.mode("overwrite").insertInto("txn_t7a")
    assert(java.nio.file.Files.exists(j))
    val redone = TxnJournal.recover(s.spark)
    assert(redone == Seq("txn-crash-7:txn_t7a", "txn-crash-7:txn_t7b"))
    assert(vs(s, "txn_t7a") == Seq(20.0, 40.0, 60.0))
    assert(vs(s, "txn_t7b") == Seq(15.0, 25.0, 35.0))
    assert(!java.nio.file.Files.exists(j))
    // Second recover: nothing in flight, nothing re-applied.
    assert(TxnJournal.recover(s.spark).isEmpty)
  }

  test("a reader session observes all or none of a 2-table commit (manifest visibility)") {
    val s = sessions.getOrCreate("txn-s9", "alice", "admin")
    fresh(s, "txn_t9a"); fresh(s, "txn_t9b")
    // Reader in a SEPARATE session, reading through the statement path
    // (which resolves via the manifest), primed on the pre-commit state.
    val r = sessions.getOrCreate("txn-s9-reader", "bob", "admin")
    def readPair(): (Seq[Double], Seq[Double]) = (
      run(r, "SELECT v FROM txn_t9a ORDER BY id").collect().map(_.getDouble(0)).toSeq,
      run(r, "SELECT v FROM txn_t9b ORDER BY id").collect().map(_.getDouble(0)).toSeq)
    assert(readPair() == (Seq(10.0, 20.0, 30.0), Seq(10.0, 20.0, 30.0)))
    // Freeze COMMIT at each intermediate state by driving its protocol
    // steps directly (the deterministic stand-in for a thread paused
    // mid-commitApply): journal -> manifest publish -> ONE base folded.
    val root = TxnJournal.stageRoot(s.spark)
    def snap(sql: String): String = {
      val dir = root.resolve(java.util.UUID.randomUUID().toString).toString
      s.spark.sql(sql).write.parquet(dir); dir
    }
    val d9a = snap("SELECT id, v * 2 AS v FROM txn_t9a")
    val d9b = snap("SELECT id, v * 2 AS v FROM txn_t9b")
    val entries = Seq("txn_t9a" -> d9a, "txn_t9b" -> d9b)
    val j = TxnJournal.write(s.spark, "txn-vis-9", entries)
    // State 1: journal written, manifest NOT yet published — reader sees
    // all-old.
    assert(readPair() == (Seq(10.0, 20.0, 30.0), Seq(10.0, 20.0, 30.0)))
    ManifestCatalog.publish(s.spark, entries)
    // State 2: manifest published, NO base folded — reader sees all-new.
    assert(readPair() == (Seq(20.0, 40.0, 60.0), Seq(20.0, 40.0, 60.0)))
    // State 3: first base folded, second NOT — the r8 partial-visibility
    // window. The manifest keeps the reader on all-new.
    s.spark.read.parquet(d9a).write.mode("overwrite").insertInto("txn_t9a")
    assert(readPair() == (Seq(20.0, 40.0, 60.0), Seq(20.0, 40.0, 60.0)))
    // Finish the protocol: second fold, journal clear, manifest drop.
    s.spark.read.parquet(d9b).write.mode("overwrite").insertInto("txn_t9b")
    TxnJournal.clear(j)
    ManifestCatalog.drop(s.spark, entries)
    // State 4: manifest empty again — reader resolves the folded bases,
    // still all-new, and the manifest views are gone from its session.
    assert(readPair() == (Seq(20.0, 40.0, 60.0), Seq(20.0, 40.0, 60.0)))
    assert(!r.spark.catalog.tableExists("txn_t9a") ||
      r.spark.sessionState.catalog.getTempView("txn_t9a").isEmpty,
      "manifest temp view must be dropped once the entry folds away")
    ManifestCatalog.tombstone(s.spark, Seq(d9a, d9b))
    s.spark.conf.set("spark.graft.txn.snapshotGraceMs", "0")
    assert(ManifestCatalog.reapTombstones(s.spark) >= 2)
  }

  test("real COMMIT is manifest-routed end-to-end for other sessions") {
    val s = sessions.getOrCreate("txn-s10", "alice", "admin")
    fresh(s, "txn_t10a"); fresh(s, "txn_t10b")
    val r = sessions.getOrCreate("txn-s10-reader", "bob", "admin")
    def readA() = run(r, "SELECT CAST(SUM(v) AS DOUBLE) AS s FROM txn_t10a")
      .collect().head.getDouble(0)
    assert(readA() == 60.0)
    run(s, "BEGIN")
    run(s, "UPDATE txn_t10a SET v = v * 10")
    run(s, "UPDATE txn_t10b SET v = v + 1")
    assert(readA() == 60.0) // uncommitted: invisible to the reader
    run(s, "COMMIT")
    assert(readA() == 600.0)
    assert(run(r, "SELECT CAST(SUM(v) AS DOUBLE) AS s FROM txn_t10b")
      .collect().head.getDouble(0) == 63.0)
  }

  test("bootstrap reconciles manifest entries with no journal (crash between clear and drop)") {
    val s = sessions.getOrCreate("txn-s11", "alice", "admin")
    fresh(s, "txn_t11")
    val root = TxnJournal.stageRoot(s.spark)
    val dir = root.resolve(java.util.UUID.randomUUID().toString).toString
    s.spark.sql("SELECT id, v * 3 AS v FROM txn_t11").write.parquet(dir)
    // crash state: no journal, manifest entry present, base not folded
    // (protocol order says folds complete first — reconcile defensively)
    ManifestCatalog.publish(s.spark, Seq("txn_t11" -> dir))
    assert(TxnJournal.recover(s.spark).isEmpty)
    assert(vs(s, "txn_t11") == Seq(30.0, 60.0, 90.0))
    assert(ManifestCatalog.read(s.spark)._2.isEmpty,
      "reconciliation must drop the folded manifest entry")
  }

  test("refresh honors a skip-set change at the same manifest version (post-rollback staleness)") {
    // ADVICE r9: ROLLBACK drops a session's shadow temp view without
    // bumping the manifest version. If refresh() fast-paths on version
    // alone, the previously-skipped table falls back to the BASE catalog
    // table while another session's commit is mid-fold. The skip set must
    // be part of the cached view's identity.
    val s = sessions.getOrCreate("txn-s12", "alice", "admin")
    fresh(s, "txn_t12")
    val root = TxnJournal.stageRoot(s.spark)
    val dir = root.resolve(java.util.UUID.randomUUID().toString).toString
    s.spark.sql("SELECT id, v * 5 AS v FROM txn_t12").write.parquet(dir)
    ManifestCatalog.publish(s.spark, Seq("txn_t12" -> dir))
    try {
      // Own-txn view: skip the table (read-your-writes outranks manifest).
      ManifestCatalog.refresh(s.spark, skip = Set("txn_t12"))
      assert(vs(s, "txn_t12") == Seq(10.0, 20.0, 30.0))
      // Post-rollback: same version, empty skip — must re-register the
      // manifest view, not no-op.
      ManifestCatalog.refresh(s.spark)
      assert(vs(s, "txn_t12") == Seq(50.0, 100.0, 150.0),
        "skip-set change at an unmoved manifest version must re-resolve through the manifest")
    } finally {
      ManifestCatalog.drop(s.spark, Seq("txn_t12" -> dir))
      ManifestCatalog.refresh(s.spark)
    }
  }

  test("a journal whose staged data is gone refuses recovery") {
    val s = sessions.getOrCreate("txn-s8", "alice", "admin")
    fresh(s, "txn_t8")
    val missing = TxnJournal.stageRoot(s.spark).resolve("never-written").toString
    val j = TxnJournal.write(s.spark, "txn-crash-8", Seq("txn_t8" -> missing))
    val e = intercept[IllegalStateException](TxnJournal.recover(s.spark))
    assert(e.getMessage.contains("missing staging dir"))
    // Table untouched, journal preserved for forensics.
    assert(vs(s, "txn_t8") == Seq(10.0, 20.0, 30.0))
    assert(java.nio.file.Files.exists(j))
    TxnJournal.clear(j)
  }
}
