package graft.plans

/** DuckDB's FROM-first statement syntax:
  *
  *   FROM tbl                      -> SELECT * FROM tbl
  *   FROM tbl WHERE p ORDER BY c   -> SELECT * FROM tbl WHERE p ORDER BY c
  *   FROM tbl SELECT a, b WHERE p  -> SELECT a, b FROM tbl WHERE p
  *
  * The rewrite applies only when the whole statement STARTS with FROM
  * (after whitespace), so subqueries, CTE bodies and normal statements are
  * untouched; a leading-FROM statement is not valid Spark SQL anywhere, so
  * there is nothing to misparse. When an explicit SELECT clause follows
  * the FROM relation (DuckDB allows it anywhere before WHERE/GROUP/...),
  * it is lifted to the front; otherwise `SELECT *` is implied.
  */
object FromFirstRewrite {
  import SqlScan.topLevel

  def rewrite(sql: String): String = {
    val trimmed = sql.dropWhile(_.isWhitespace)
    if (!(trimmed.length >= 5 && trimmed.substring(0, 4).equalsIgnoreCase("FROM") &&
        Character.isWhitespace(trimmed.charAt(4)))) return sql
    val body = trimmed.stripSuffix(";")
    topLevel(body, "SELECT").headOption match {
      case Some(selIdx) =>
        // FROM <rel...> SELECT <list...> — the list runs to the statement's
        // next top-level clause keyword (or the end)
        val afterSel = body.substring(selIdx + "SELECT".length)
        val stops = Seq("WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW",
          "ORDER", "LIMIT", "UNION", "INTERSECT", "EXCEPT")
        val cut = stops.flatMap(k => topLevel(afterSel, k)).sorted.headOption
          .getOrElse(afterSel.length)
        val selectList = afterSel.substring(0, cut).trim
        val tail = afterSel.substring(cut)
        s"SELECT $selectList ${body.substring(0, selIdx).trim} ${tail.trim}".trim
      case None =>
        s"SELECT * $body"
    }
  }
}
