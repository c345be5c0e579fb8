package graft.engine

/** Query logging with the reference's level semantics
  * (`/root/reference/src/duckdb/duckdb_statement.cpp:718-727` threshold
  * resolution, `:886-894` the attempt record;
  * `tests/integration/test_set_query_log_level.cpp`,
  * `test_internal_query_log_level.cpp`):
  *
  *   - every statement emits an "attempt" record whose NATURAL severity is
  *     INFO for client statements and DEBUG for engine-internal ones
  *     (metadata listings) — carried in the `is_internal` field;
  *   - the effective threshold is the SESSION's `gizmosql.query_log_level`,
  *     falling back to the server's global value (the session settings
  *     overlay does exactly that resolution), so a `SET GLOBAL` propagates
  *     immediately to sessions without an override;
  *   - a record below the threshold is SUPPRESSED, never promoted
  *     ([[GraftLog.logDynamicAt]]); the overall logger threshold gates
  *     independently inside [[GraftLog.log]];
  *   - SQL text is literal-redacted before logging
  *     ([[Observability.redact]]).
  */
object QueryLog {

  def threshold(session: SessionState): String =
    session.settings.get("gizmosql.query_log_level").getOrElse("info")

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Emit the statement-attempt record, subject to the session threshold. */
  def statementAttempt(session: SessionState, sql: String,
      isInternal: Boolean = false, flightMethod: String = "statement"): Unit =
    GraftLog.logDynamicAt(threshold(session), GraftLog.LogRecord(
      System.currentTimeMillis(),
      level = if (isInternal) "DEBUG" else "INFO",
      message = "Client is attempting to run a SQL command",
      component = "query",
      sessionId = session.id, username = session.user, role = session.role,
      fieldsJson = s"""{"kind":"sql","status":"attempt",""" +
        s""""sql":${jsonQuote(Observability.redact(sql))},""" +
        s""""is_internal":"$isInternal","flight_method":"$flightMethod"}"""))
}
