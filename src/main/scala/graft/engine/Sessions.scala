package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Per-client session state: an isolated `SparkSession.newSession()` (own
  * temp views, conf, UDFs — the Spark analogue of the reference's dedicated
  * engine connection per session,
  * `/root/reference/src/common/include/detail/session_context.h:64-113`),
  * session settings, prepared statements, and a kill flag.
  */
final class SessionState(
    val id: String,
    val user: String,
    val role: String,
    val spark: SparkSession,
    val settings: SessionSettings,
    // None = unrestricted; Some(set) = catalog_access claim from the token.
    val catalogAccess: Option[Set[String]] = None) {

  final case class Prepared(handle: String, sql: String, schema: Option[StructType])

  private val prepared = new ConcurrentHashMap[String, Prepared]()
  /** Session-scoped SQL macros (DuckDB CREATE MACRO), expanded by inlining. */
  val macros = new Macros.Registry
  @volatile var killRequested: Boolean = false
  /** Open SQL-path transaction handle, if any (BEGIN ... COMMIT/ROLLBACK). */
  @volatile var activeTxn: Option[String] = None

  /** Job-group tag for everything this session runs — the cancellation hook. */
  def jobGroup: String = s"graft-session-$id"

  /** Analysis only — no execution (reference computes the schema from the
    * prepared statement without running it, duckdb_statement.cpp:2456-2467).
    * Parameterized statements (`:name` placeholders) defer schema to
    * execution time, like the reference's parameter schema path.
    */
  def prepare(sql0: String): Prepared = {
    // Prepared statements speak the same dialect as direct ones (QUALIFY,
    // * EXCLUDE, read_parquet, session macros): rewrite ONCE at prepare
    // time and store the desugared text, so execution and re-prepare stay
    // consistent. The guard runs here too — both as the rewrite hook (so
    // operand schema probes are authorized before they analyze anything)
    // and on the final text: executePrepared runs the stored SQL directly,
    // so prepare time is where a blocked statement must be rejected.
    val guard: String => Unit = s =>
      StatementGuard.check(spark, s, isAdmin, isReadOnly) match {
        case StatementGuard.Blocked(reason) => throw new SecurityException(reason)
        case StatementGuard.Allowed => ()
      }
    val sql = graft.plans.Dialect.rewrite(Macros.expand(sql0, macros), spark, guard)
    guard(sql)
    val schema = try Some(spark.sql(sql).schema) catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null && e.getCondition.contains("UNBOUND_SQL_PARAMETER") => None
    }
    val p = Prepared(UUID.randomUUID().toString, sql, schema)
    prepared.put(p.handle, p)
    p
  }

  /** Execute a prepared statement with typed named parameters via Spark's
    * parameterized SQL — typed binding, unlike the reference's stringified
    * scalars (`duckdb_server.cpp:747-772`).
    */
  def executePrepared(handle: String, params: Map[String, Any] = Map.empty) =
    lookupPrepared(handle) match {
      case None => throw new IllegalArgumentException(s"unknown prepared statement $handle")
      case Some(p) => spark.sql(p.sql, params)
    }

  def lookupPrepared(handle: String): Option[Prepared] = Option(prepared.get(handle))
  def closePrepared(handle: String): Boolean = prepared.remove(handle) != null
  def preparedCount: Int = prepared.size()

  def isAdmin: Boolean = role == "admin"
  def isReadOnly: Boolean = role == "readonly"
}

/** Session registry with killed-session tombstones — `KILL SESSION` stays
  * idempotent across the two-phase GetFlightInfo/DoGet exchange
  * (`/root/reference/src/duckdb/duckdb_server.cpp:1231-1263`).
  */
final class SessionManager(root: SparkSession, global: GlobalSettings) {
  private val sessions = new ConcurrentHashMap[String, SessionState]()
  private val killedTombstones = ConcurrentHashMap.newKeySet[String]()

  /** Engine-global attachments (ATTACH/DETACH) — shared across sessions like
    * the reference's attached catalogs.
    */
  val attachments = new AttachManager

  /** Transaction handles for both the wire RPC surface and the SQL
    * BEGIN/COMMIT/ROLLBACK intercepts ([[TxnDml]]).
    */
  val transactions = new Transactions

  def getOrCreate(sessionId: String, user: String, role: String,
      catalogAccess: Option[Set[String]] = None): SessionState = {
    if (killedTombstones.contains(sessionId))
      throw new IllegalStateException(s"session $sessionId was killed")
    sessions.computeIfAbsent(sessionId, _ =>
      new SessionState(sessionId, user, role, root.newSession(),
        new SessionSettings(global), catalogAccess))
  }

  /** Non-creating lookup (reference `:917-955` — liveness probes must not
    * resurrect sessions).
    */
  def lookup(sessionId: String): Option[SessionState] = Option(sessions.get(sessionId))

  /** Kill: cancel in-flight jobs, flag the session, tombstone the id.
    * Idempotent — killing an already-killed or unknown session succeeds.
    */
  def kill(sessionId: String): Boolean = {
    killedTombstones.add(sessionId)
    Option(sessions.remove(sessionId)) match {
      case Some(s) =>
        s.killRequested = true
        root.sparkContext.cancelJobGroup(s.jobGroup)
        true
      case None => false
    }
  }

  def close(sessionId: String): Unit = Option(sessions.remove(sessionId)).foreach { s =>
    root.sparkContext.cancelJobGroup(s.jobGroup)
  }

  def isKilled(sessionId: String): Boolean = killedTombstones.contains(sessionId)
  def active: Seq[String] = sessions.keySet().asScala.toSeq
}
