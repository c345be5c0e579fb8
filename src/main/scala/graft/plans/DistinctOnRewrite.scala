package graft.plans

/** DuckDB's `SELECT DISTINCT ON (exprs) ...` for Spark — one row kept per
  * distinct value of `exprs`, the pick governed by the ORDER BY clause
  * (DuckDB semantics: the first row of each group under the query's
  * ordering; without ORDER BY the pick is arbitrary — supported, but only
  * an ordered query is cross-engine deterministic).
  *
  * Desugars to the standard windowed-subquery filter:
  *
  *   SELECT DISTINCT ON (a) x, y FROM t WHERE p ORDER BY a, b DESC
  *     -> SELECT x, y FROM (
  *          SELECT *, ROW_NUMBER() OVER (PARTITION BY a ORDER BY a, b DESC)
  *            AS __don_rn FROM t WHERE p) __don
  *        WHERE __don_rn = 1 ORDER BY a, b DESC
  *
  * The window's ORDER BY is the query's own ORDER BY (exactly DuckDB's
  * tie-break rule); with no ORDER BY the window orders by the partition
  * exprs alone (arbitrary-but-stable pick inside the group, matching
  * DuckDB's "any row"). The inner SELECT * preserves every base column, so
  * both the outer select list and the outer ORDER BY resolve unchanged.
  *
  * Declared unsupported (loud error, no silent misparse): DISTINCT ON in a
  * set-operation branch, or combined with GROUP BY at the same level
  * (DuckDB applies DISTINCT ON after aggregation — wrap the aggregate in a
  * subquery). ORDER BY entries referencing select-list ALIASES resolve
  * against the base relation here; an alias-only sort key fails analysis
  * with Spark's clear unresolved-column error rather than silently picking
  * a different row.
  */
object DistinctOnRewrite {
  import SqlScan._

  private val HeadRe = """(?is)^(\s*SELECT\s+)DISTINCT\s+ON\s*\(""".r

  def rewrite(sql: String): String = {
    if (!"""(?is)DISTINCT\s+ON""".r.findFirstIn(sql).exists(_ => true)) return sql
    rewriteTop(rewriteParens(sql))
  }

  /** Recurse into parenthesized subqueries so DISTINCT ON composes at any
    * nesting depth (literals never scanned).
    */
  private def rewriteParens(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          val end = SqlText.quotedEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case '(' =>
          val close = try matchingParen(sql, i) catch { case _: Exception => -1 }
          if (close < 0) { sb.append('('); i += 1 }
          else {
            sb.append('(').append(rewrite(sql.substring(i + 1, close))).append(')')
            i = close + 1
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def rewriteTop(sql: String): String = {
    val m = HeadRe.findFirstMatchIn(sql).getOrElse(return sql)
    val parenOpen = m.end - 1
    val parenClose = matchingParen(sql, parenOpen)
    val exprs = sql.substring(parenOpen + 1, parenClose).trim
    if (exprs.isEmpty)
      throw new IllegalArgumentException("DISTINCT ON requires at least one expression")
    val rest = sql.substring(parenClose + 1) // select list + FROM ... tail

    if (topLevel(rest, "GROUP").nonEmpty)
      throw new IllegalArgumentException(
        "DISTINCT ON combined with GROUP BY at the same level is not supported — " +
        "wrap the aggregate in a subquery")
    Seq("UNION", "INTERSECT", "EXCEPT").foreach { k =>
      if (topLevel(rest, k).nonEmpty) throw new IllegalArgumentException(
        s"DISTINCT ON in a set-operation branch is not supported — wrap it in a subquery")
    }
    if (topLevel(rest, "QUALIFY").nonEmpty)
      throw new IllegalArgumentException(
        "DISTINCT ON combined with QUALIFY at the same level is not supported — " +
        "wrap one of them in a subquery")

    val fromIdx = topLevel(rest, "FROM").headOption.getOrElse(
      throw new IllegalArgumentException("DISTINCT ON requires a FROM clause"))
    val selectList = rest.substring(0, fromIdx).trim
    val afterFrom = rest.substring(fromIdx)

    // split the tail at top-level ORDER BY / LIMIT (both stay OUTER)
    val orderIdx = topLevel(afterFrom, "ORDER").headOption
    val limitIdx = topLevel(afterFrom, "LIMIT").headOption
    val bodyEnd = Seq(orderIdx, limitIdx).flatten.sorted.headOption.getOrElse(afterFrom.length)
    val body = afterFrom.substring(0, bodyEnd) // FROM ... WHERE ... (window source)
    val tail = afterFrom.substring(bodyEnd).stripSuffix(";")
    val orderText = orderIdx.map { i =>
      val end = limitIdx.filter(_ > i).getOrElse(afterFrom.length)
      afterFrom.substring(i, end).trim.stripSuffix(";")
        .replaceFirst("(?is)^ORDER\\s+BY\\s+", "")
    }

    val winOrder = orderText.getOrElse(exprs)
    s"SELECT $selectList FROM (SELECT *, ROW_NUMBER() OVER " +
      s"(PARTITION BY $exprs ORDER BY $winOrder) AS __don_rn $body) __don " +
      s"WHERE __don_rn = 1 $tail"
  }
}
