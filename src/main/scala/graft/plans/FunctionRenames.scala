package graft.plans

/** Renames for function spellings that Spark's PARSER intercepts before the
  * function registry can see them. `date_diff(...)` hits the grammar's
  * timestampdiff rule (which demands an unquoted unit keyword and computes
  * complete-interval counts), so DuckDB's quoted-part boundary-count form
  * `date_diff('month', a, b)` can never reach our registry under its own
  * name — it is renamed to `datediff(`, which resolves through
  * DuckDbCompat's builder (3-arg quoted part → boundary semantics, 2-arg →
  * Spark's day diff). Token-aware outside string literals and quoted
  * identifiers; only applies when the name is followed by '('.
  */
object FunctionRenames {

  // Both spellings hit the grammar rule when called with 3 args, so both
  // redirect to a name only the registry knows. The rename fires ONLY when
  // the first argument starts with a quote — DuckDB's part-as-string form;
  // unquoted units (Spark's own dialect) keep the parser's semantics.
  private val renames: Seq[(String, String)] = Seq(
    "date_diff" -> "graft_date_diff",
    "datediff" -> "graft_date_diff")

  def rewrite(sql: String): String = {
    if (!renames.exists { case (from, _) => containsIgnoreCase(sql, from) }) return sql
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(pos: Int, w: String): Boolean =
      pos + w.length <= n && sql.substring(pos, pos + w.length).equalsIgnoreCase(w) &&
        (pos == 0 || !isWord(sql.charAt(pos - 1))) &&
        (pos + w.length == n || !isWord(sql.charAt(pos + w.length)))
    while (i < n) {
      sql.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          val end = SqlText.quotedEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case _ =>
          val hit = renames.find { case (from, _) =>
            wordAt(i, from) && {
              var k = i + from.length
              while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
              if (k < n && sql.charAt(k) == '(') {
                k += 1
                while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
                k < n && sql.charAt(k) == '\''
              } else false
            }
          }
          hit match {
            case Some((from, to)) => sb.append(to); i += from.length
            case None => sb.append(sql.charAt(i)); i += 1
          }
      }
    }
    sb.toString
  }

  private def containsIgnoreCase(s: String, w: String): Boolean =
    s.toLowerCase.contains(w)
}
