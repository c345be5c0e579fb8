package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock
import org.apache.spark.sql.SparkSession

/** JVM-wide per-table commit serialization.
  *
  * Every path that folds data into a base table — a transaction's
  * COMMIT apply ([[TxnDml.commitApply]]), an autocommitted row-level DML
  * statement ([[graft.sources.RowDml]]), or a plain non-transactional
  * INSERT/COPY FROM — takes this lock for its target table(s) around the
  * whole journal→publish→fold→drop window. That closes the lost-update race
  * the r10 review flagged: without it, a non-transactional insert that runs
  * `unshadow` during another session's publish-to-fold window lands on the
  * base table and is then silently clobbered by the in-flight commit's fold.
  * With the lock, the insert simply waits until the fold + manifest drop
  * complete, then appends to the post-commit base.
  *
  * Readers never take the lock — visibility is the manifest's job
  * ([[ManifestCatalog]]); this lock only serializes WRITERS per table.
  * The engine is single-process (reference: one DuckDB instance per server,
  * `/root/reference/src/duckdb/duckdb_server.cpp:1987-2014`), so in-process
  * locks are the complete story; a multi-writer object-store deployment
  * would swap this for the conditional-PUT the manifest write already
  * models.
  *
  * Deadlock-free by construction: multi-table acquisitions sort names first,
  * and no fold path acquires a second table set while holding one.
  */
object CommitLock {

  private val locks = new ConcurrentHashMap[String, ReentrantLock]()

  private def lockFor(table: String): ReentrantLock =
    locks.computeIfAbsent(table.toLowerCase, _ => new ReentrantLock())

  /** Run `f` holding the commit locks for `tables` (sorted acquisition). */
  def withTables[T](tables: Seq[String])(f: => T): T = {
    val ls = tables.map(_.split("\\.").last).distinct.sorted.map(lockFor)
    ls.foreach(_.lock())
    try f finally ls.reverse.foreach(_.unlock())
  }

  /** Exclusive write window for a non-transactional insert path: take the
    * table's commit lock, then verify no in-flight commit still maps the
    * table in the manifest. Inside the lock that can only mean a FOREIGN
    * publish that will never fold in this process (a half-driven test
    * protocol or an external writer) — failing loudly beats silently racing
    * its fold (r10 review, medium).
    */
  def withExclusiveWrite[T](spark: SparkSession, table: String)(f: => T): T =
    withTables(Seq(table)) {
      val name = table.split("\\.").last
      if (ManifestCatalog.read(spark)._2.contains(name))
        throw new IllegalStateException(
          s"table $name is being committed (manifest maps it to an unfolded " +
            "snapshot); retry after the commit completes")
      ManifestCatalog.unshadow(spark, table)
      f
    }
}
