package graft.plans

/** DuckDB `SELECT * EXCLUDE (...)` → Spark `SELECT * EXCEPT (...)`.
  *
  * The reference engine's own code emits this spelling
  * (`/root/reference/src/enterprise/instrumentation/instrumentation_manager
  * .cpp:682-696`), and DuckDB users reach for it constantly; Spark spells
  * the same star modifier EXCEPT. The rewrite replaces the keyword outside
  * string literals (EXCLUDE is not valid Spark SQL anywhere, so any
  * unquoted occurrence is the star modifier) and adds the parentheses Spark
  * requires when DuckDB's paren-free single-column form was used.
  */
object StarExclude {

  def rewrite(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
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
        case c if Character.toUpperCase(c) == 'E' &&
            i + 7 <= n && sql.substring(i, i + 7).equalsIgnoreCase("EXCLUDE") &&
            (i == 0 || !isWord(sql.charAt(i - 1))) &&
            (i + 7 == n || !isWord(sql.charAt(i + 7))) =>
          sb.append("EXCEPT")
          var k = i + 7
          while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
          if (k < n && sql.charAt(k) != '(') {
            // paren-free single column: EXCLUDE col -> EXCEPT (col)
            var e = k
            while (e < n && isWord(sql.charAt(e))) e += 1
            sb.append(" (").append(sql.substring(k, e)).append(")")
            i = e
          } else i = i + 7
        case c =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
}
