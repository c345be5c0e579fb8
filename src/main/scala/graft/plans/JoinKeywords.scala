package graft.plans

/** DuckDB's bare `SEMI JOIN` / `ANTI JOIN` → Spark's `LEFT SEMI JOIN` /
  * `LEFT ANTI JOIN`.
  *
  * DuckDB accepts the LEFT-less spelling (reference test queries use it);
  * Spark's parser requires the LEFT keyword. Token-aware replacement
  * outside string literals and quoted identifiers, skipped when a
  * LEFT/RIGHT qualifier is already present. Dialect note: a relation
  * aliased literally `semi`/`anti` directly before JOIN is read as the
  * join type — exactly how DuckDB itself parses that text, so one text
  * means one thing on both engines. RIGHT SEMI/ANTI (DuckDB-only) is left
  * untouched and fails in Spark's parser with its normal error.
  */
object JoinKeywords {

  def rewrite(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def wordAt(pos: Int, w: String): Boolean =
      pos + w.length <= n && sql.substring(pos, pos + w.length).equalsIgnoreCase(w) &&
        (pos == 0 || !isWord(sql.charAt(pos - 1))) &&
        (pos + w.length == n || !isWord(sql.charAt(pos + w.length)))
    // the previous non-whitespace word already qualifies the join
    def prevWordIn(words: Set[String]): Boolean = {
      var e = sb.length
      while (e > 0 && Character.isWhitespace(sb.charAt(e - 1))) e -= 1
      var s = e
      while (s > 0 && isWord(sb.charAt(s - 1))) s -= 1
      words.contains(sb.substring(s, e).toUpperCase)
    }
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          val j = sql.indexOf('\'', i + 1)
          val end = if (j < 0) n else j + 1
          sb.append(sql.substring(i, end)); i = end
        case '"' =>
          val j = sql.indexOf('"', i + 1)
          val end = if (j < 0) n else j + 1
          sb.append(sql.substring(i, end)); i = end
        case c if (Character.toUpperCase(c) == 'S' && wordAt(i, "SEMI")) ||
            (Character.toUpperCase(c) == 'A' && wordAt(i, "ANTI")) =>
          val kw = if (Character.toUpperCase(c) == 'S') "SEMI" else "ANTI"
          // must be immediately followed by JOIN (whitespace-separated)
          var k = i + 4
          while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
          if (wordAt(k, "JOIN") && !prevWordIn(Set("LEFT", "RIGHT")))
            sb.append("LEFT ").append(sql.substring(i, i + 4))
          else sb.append(sql.substring(i, i + 4))
          i += 4
        case c =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
}
