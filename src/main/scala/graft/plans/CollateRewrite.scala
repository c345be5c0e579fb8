package graft.plans

/** DuckDB collation names mapped onto Spark 4's native collation support.
  *
  * The reference preloads the icu extension for every user
  * (`/root/reference/src/common/gizmosql_library.cpp:814-819`), so DuckDB
  * `COLLATE` clauses are part of its served dialect. Spark 4 has first-class
  * collations with its own name set, and the `expr COLLATE name` syntax is
  * identical — only the NAMES differ. This stage renames them, token-aware
  * outside string literals/quoted identifiers:
  *
  *   - `NOCASE`   → `UTF8_LCASE`   (lowercase-compare, DuckDB's NOCASE)
  *   - `NOACCENT` → `UNICODE_AI`   (accent-insensitive, ICU)
  *   - `NOCASE.NOACCENT` / `NOACCENT.NOCASE` → `UNICODE_CI_AI`
  *   - `NFC`      → `UNICODE`      (ICU root: canonically-equivalent
  *                                  sequences compare equal, the property
  *                                  DuckDB's NFC collation provides)
  *   - `C` / `POSIX` / `BINARY` → `UTF8_BINARY`
  *
  * ICU locale names (`de`, `en_us`, …) pass through unchanged — Spark's
  * collation registry resolves the same ICU locales natively. Names that
  * are already Spark collations pass through untouched (the map keys never
  * collide with Spark's name set).
  */
object CollateRewrite {

  private val renames = Map(
    "nocase" -> "UTF8_LCASE",
    "noaccent" -> "UNICODE_AI",
    "nocase.noaccent" -> "UNICODE_CI_AI",
    "noaccent.nocase" -> "UNICODE_CI_AI",
    "nfc" -> "UNICODE",
    "c" -> "UTF8_BINARY",
    "posix" -> "UTF8_BINARY",
    "binary" -> "UTF8_BINARY")

  def rewrite(sql: String): String = {
    if (!sql.toLowerCase.contains("collate")) return sql
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      sql.charAt(i) match {
        case '\'' | '"' | '`' =>
          val end = SqlText.quotedEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case _ =>
          val kw = "collate"
          val atKeyword = i + kw.length <= n &&
            sql.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
            (i == 0 || !isWord(sql.charAt(i - 1))) &&
            (i + kw.length == n || !isWord(sql.charAt(i + kw.length)))
          if (atKeyword) {
            sb.append(sql.substring(i, i + kw.length))
            i += kw.length
            while (i < n && Character.isWhitespace(sql.charAt(i))) { sb.append(sql.charAt(i)); i += 1 }
            // collation name: bare (dotted allowed: NOCASE.NOACCENT) or
            // double-quoted (DuckDB accepts "NOCASE")
            if (i < n && sql.charAt(i) == '"') {
              val end = SqlText.quotedEnd(sql, i)
              val name = sql.substring(i + 1, end - 1)
              sb.append(renames.getOrElse(name.toLowerCase, sql.substring(i, end)))
              i = end
            } else {
              var k = i
              while (k < n && (isWord(sql.charAt(k)) || sql.charAt(k) == '.')) k += 1
              if (k > i) {
                val name = sql.substring(i, k)
                sb.append(renames.getOrElse(name.toLowerCase, name))
                i = k
              }
            }
          } else { sb.append(sql.charAt(i)); i += 1 }
      }
    }
    sb.toString
  }
}
