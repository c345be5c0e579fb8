package graft.engine

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** Transaction handles, re-implementing the `BeginTransaction`/`EndTransaction`
  * RPC surface (`/root/reference/src/duckdb/duckdb_server.cpp:1987-2014`):
  * UUID handle per session, COMMIT/ROLLBACK end it, bulk ingest joins an open
  * transaction instead of nesting (`:1864-1869`).
  *
  * Two write modes coexist per handle:
  *   - STAGED (the SQL path, [[TxnDml]]): row-level UPDATE/DELETE/MERGE
  *     inside `BEGIN ... COMMIT/ROLLBACK` write full post-image snapshots to
  *     staging and shadow the table with a session temp view; COMMIT applies
  *     each table's final snapshot, ROLLBACK discards everything — real
  *     multi-statement atomicity-per-table with read-your-writes inside the
  *     session (other sessions read the committed table throughout).
  *   - EAGER (the wire bulk-ingest path): writes apply immediately and set
  *     `sawWrites`; ROLLBACK after an eager write reports the limitation as
  *     an error rather than silently succeeding (SURVEY.md §7.3.4 — on a
  *     Delta/Iceberg catalog the same handle would carry a real table
  *     transaction covering ingest too).
  */
final class Transactions {

  sealed trait TxnState
  case object Open extends TxnState
  case object Committed extends TxnState
  case object RolledBack extends TxnState

  final case class Txn(id: String, sessionId: String, var state: TxnState,
      var sawWrites: Boolean = false) {
    // table name -> staging dir of its LATEST full post-image, insertion
    // ordered so commit applies tables in first-touch order.
    val staged: java.util.LinkedHashMap[String, String] =
      new java.util.LinkedHashMap[String, String]()
  }

  private val txns = new ConcurrentHashMap[String, Txn]()

  def begin(sessionId: String): String = {
    val id = UUID.randomUUID().toString
    txns.put(id, Txn(id, sessionId, Open))
    id
  }

  def lookup(id: String): Option[Txn] = Option(txns.get(id))

  def markWrite(id: String): Unit = lookup(id).foreach(_.sawWrites = true)

  /** Record table's latest staged post-image (replacing any earlier one). */
  def stage(id: String, table: String, dir: String): Unit =
    lookup(id).foreach(t => t.staged.synchronized { t.staged.put(table, dir); () })

  def commit(id: String): Either[String, Unit] = end(id, Committed)

  def rollback(id: String): Either[String, Unit] =
    lookup(id) match {
      case Some(t) if t.sawWrites =>
        end(id, RolledBack)
        Left("rollback requested but writes were already applied " +
          "(no multi-statement ACID on plain Parquet — declared limitation)")
      case _ => end(id, RolledBack)
    }

  private def end(id: String, to: TxnState): Either[String, Unit] =
    lookup(id) match {
      case None => Left(s"unknown transaction $id")
      case Some(t) if t.state != Open => Left(s"transaction $id already ${t.state}")
      case Some(t) => t.state = to; Right(())
    }

  def openCount: Int = {
    var n = 0
    txns.forEach((_, t) => if (t.state == Open) n += 1)
    n
  }
}
