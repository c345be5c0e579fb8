package graft.plans

/** DuckDB's `SIMILAR TO` and `GLOB` match operators for Spark's parser.
  *
  * Probed DuckDB 1.0 semantics:
  *   - `s SIMILAR TO 'pat'` is an ANCHORED full-match REGEX — plain regex
  *     syntax, NOT the SQL-standard %/_ wildcards ('abc' SIMILAR TO 'a%c'
  *     is false, the % is literal). So it maps onto Spark's infix RLIKE
  *     with explicit anchors: `s RLIKE '^(?:pat)$'`.
  *   - `s GLOB 'pat'` matches `*`, `?` and `[class]` (with `[!...]`
  *     negation), everything else literal ('a.c' GLOB 'a.c' true, 'abc'
  *     false), anchored, case-sensitive. Translated to an anchored RLIKE
  *     with regex metacharacters escaped (doubled backslashes so Spark's
  *     string-literal escaping yields single ones).
  *
  * Both rewrites keep the expression INFIX — only the operator keyword and
  * the pattern literal change — so the left operand needs no textual
  * capture. `NOT SIMILAR TO` / `NOT GLOB` ride on Spark's native
  * `NOT RLIKE`. The pattern must be a string literal directly after the
  * keyword (the only form reference queries use); a computed pattern fails
  * loudly rather than mis-parsing.
  */
object SimilarToRewrite {

  def rewrite(sql: String): String = {
    val up = sql.toUpperCase
    if (!up.contains("SIMILAR") && !up.contains("GLOB")) return sql
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(pos: Int, w: String): Boolean =
      pos + w.length <= n && sql.substring(pos, pos + w.length).equalsIgnoreCase(w) &&
        (pos == 0 || !isWord(sql.charAt(pos - 1))) &&
        (pos + w.length == n || !isWord(sql.charAt(pos + w.length)))
    def skipWs(pos: Int): Int = {
      var k = pos
      while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
      k
    }
    // reads the complete single-quoted literal starting at `pos` ('' stays
    // an escaped quote); returns (content, indexAfterLiteral) or null
    def literalAt(pos: Int): (String, Int) = {
      if (pos >= n || sql.charAt(pos) != '\'') return null
      val out = new StringBuilder
      var k = pos + 1
      while (k < n) {
        val c = sql.charAt(k)
        if (c == '\'') {
          if (k + 1 < n && sql.charAt(k + 1) == '\'') { out.append("''"); k += 2 }
          else return (out.toString, k + 1)
        } else { out.append(c); k += 1 }
      }
      null
    }
    while (i < n) {
      sql.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          val end = SqlText.quotedEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case _ if wordAt(i, "SIMILAR") && {
            val k = skipWs(i + 7); wordAt(k, "TO")
          } =>
          val afterTo = skipWs(skipWs(i + 7) + 2)
          literalAt(afterTo) match {
            case null => throw new IllegalArgumentException(
              "SIMILAR TO requires a literal pattern (computed patterns are not supported)")
            case (pat, after) =>
              // the pattern re-embeds into a Spark single-quoted literal,
              // whose parser consumes backslash escapes — double them so
              // regex classes like \d survive (the GLOB path below already
              // does this inside globToRegex)
              sb.append("RLIKE '^(?:").append(pat.replace("\\", "\\\\")).append(")$'")
              i = after
          }
        case _ if wordAt(i, "GLOB") && literalAt(skipWs(i + 4)) != null =>
          val (pat, after) = literalAt(skipWs(i + 4))
          sb.append("RLIKE '^(?:").append(globToRegex(pat)).append(")$'")
          i = after
        case c =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Glob → regex, emitted for a Spark single-quoted literal (backslashes
    * doubled so the string parser yields single ones).
    */
  private[plans] def globToRegex(glob: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = glob.length
    while (i < n) {
      glob.charAt(i) match {
        case '*' => out.append(".*"); i += 1
        case '?' => out.append('.'); i += 1
        case '[' =>
          val close = glob.indexOf(']', i + 2) // a ] directly after [ or [! is literal
          if (close < 0) throw new IllegalArgumentException(
            s"GLOB: unterminated character class in '$glob'")
          val body = glob.substring(i + 1, close)
          val cls = if (body.startsWith("!")) "^" + body.drop(1) else body
          out.append('[').append(cls).append(']')
          i = close + 1
        case ch if "\\.^$|()+{}".indexOf(ch) >= 0 =>
          out.append("\\\\").append(ch); i += 1
        case ch => out.append(ch); i += 1
      }
    }
    out.toString
  }
}
