package graft.engine

/** SetSessionOptions / GetSessionOptions, re-implementing
  * (`/root/reference/src/duckdb/duckdb_server.cpp:2044-2109`): `catalog` and
  * `schema` options map to Spark's current catalog/database after identifier
  * sanitization (the reference rejects any other option name and unsafe
  * identifiers); the getter returns current_catalog()/current_schema() and
  * must NOT create a session (non-creating lookup, `:917-955`).
  */
object SessionOptions {

  private val SafeIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r

  final case class Options(catalog: String, schema: String)

  /** Apply one option; mirrors the reference's sanitize + USE behavior. */
  def set(session: SessionState, name: String, value: String): Either[String, Unit] =
    name match {
      case "catalog" | "schema" =>
        if (SafeIdent.findFirstIn(value).isEmpty)
          Left(s"invalid identifier '$value' for session option $name")
        else
          try {
            if (name == "catalog") session.spark.catalog.setCurrentCatalog(value)
            else session.spark.catalog.setCurrentDatabase(value)
            Right(())
          } catch {
            case e: Exception => Left(s"cannot set $name to '$value': ${e.getMessage}")
          }
      case other => Left(s"unknown session option '$other' (only catalog/schema are settable)")
    }

  /** Non-creating read of the current options. */
  def get(sessions: SessionManager, sessionId: String): Either[String, Options] =
    sessions.lookup(sessionId) match {
      case None => Left(s"unknown session $sessionId")
      case Some(s) => Right(Options(
        s.spark.catalog.currentCatalog(),
        s.spark.catalog.currentDatabase))
    }
}

/** Init-SQL execution on startup: the quote-aware `;` splitter from server
  * bootstrap (`/root/reference/src/common/gizmosql_library.cpp:122-170`) —
  * semicolons inside single/double quotes or line comments don't split.
  */
object InitSql {

  def split(script: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSingle = false
    var inDouble = false
    var inComment = false
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (inComment) {
        if (c == '\n') { inComment = false; cur.append(c) }
      } else if (inSingle) {
        cur.append(c)
        if (c == '\'') {
          // '' escape: stay inside if doubled
          if (i + 1 < script.length && script.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inSingle = false
        }
      } else if (inDouble) {
        cur.append(c)
        if (c == '"') inDouble = false
      } else c match {
        case '\'' => inSingle = true; cur.append(c)
        case '"' => inDouble = true; cur.append(c)
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          inComment = true; i += 1
        case ';' =>
          val stmt = cur.toString.trim
          if (stmt.nonEmpty) out += stmt
          cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.toSeq
  }

  /** Run each statement through the full front door (as the reference runs
    * its init SQL through the engine connection).
    */
  def run(sessions: SessionManager, session: SessionState, global: GlobalSettings,
      script: String): Seq[String] =
    split(script).map { stmt =>
      Statement.create(sessions, session, global, stmt).collect()
      stmt
    }
}
