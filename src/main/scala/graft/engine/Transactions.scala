package graft.engine

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** Transaction handles, re-implementing the `BeginTransaction`/`EndTransaction`
  * RPC surface (`/root/reference/src/duckdb/duckdb_server.cpp:1987-2014`):
  * UUID handle per session, COMMIT/ROLLBACK end it, bulk ingest joins an open
  * transaction instead of nesting (`:1864-1869`).
  *
  * DECLARED LIMITATION (SURVEY.md §7.3.4): Spark over plain Parquet has no
  * multi-statement ACID. Handles here give the wire-compatible lifecycle and
  * run statements eagerly; on a Delta/Iceberg catalog the same handle would
  * carry a real table transaction. ROLLBACK on already-executed writes
  * reports the limitation as an error rather than silently succeeding.
  */
final class Transactions {

  sealed trait TxnState
  case object Open extends TxnState
  case object Committed extends TxnState
  case object RolledBack extends TxnState

  final case class Txn(id: String, sessionId: String, var state: TxnState,
      var sawWrites: Boolean = false)

  private val txns = new ConcurrentHashMap[String, Txn]()

  def begin(sessionId: String): String = {
    val id = UUID.randomUUID().toString
    txns.put(id, Txn(id, sessionId, Open))
    id
  }

  def lookup(id: String): Option[Txn] = Option(txns.get(id))

  def markWrite(id: String): Unit = lookup(id).foreach(_.sawWrites = true)

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
