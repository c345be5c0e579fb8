package graft.plans

/** DuckDB `SELECT * REPLACE (expr AS col, ...)` star modifier for Spark.
  *
  * Spark has no REPLACE star modifier, but the same projection is
  * expressible with the one it does have:
  *
  *   * [EXCEPT (e...)] REPLACE (x1 AS n1, x2 AS n2)
  * becomes
  *   * EXCEPT (e..., n1, n2), x1 AS n1, x2 AS n2
  *
  * i.e. the replaced columns leave the star and re-enter as explicit
  * aliased expressions. One semantic difference, declared: DuckDB keeps a
  * replaced column at its original star position, this rewrite appends it
  * after the star (the driver's comparator is order-insensitive — it sorts
  * columns by name — and SQL consumers address columns by name).
  *
  * Runs AFTER [[StarExclude]], so a combined `* EXCLUDE (...) REPLACE
  * (...)` arrives here as `* EXCEPT (...) REPLACE (...)` and the two
  * modifier lists merge into one EXCEPT. Qualified stars (`t.* REPLACE
  * ...`) keep their qualifier. Token-aware: REPLACE is only treated as the
  * star modifier when the previous non-space token is the star itself (or
  * its EXCEPT group) — `CREATE OR REPLACE` and the `replace(s, a, b)`
  * function never match that shape.
  */
object StarReplace {
  import SqlScan.matchingParen

  private def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'

  def rewrite(sql: String): String = {
    var s = sql
    var guard = 0
    while (guard < 64) { // one pass per modifier occurrence (subqueries nest)
      rewriteOne(s) match {
        case Some(next) => s = next; guard += 1
        case None => return s
      }
    }
    s
  }

  /** Rewrite the first star-modifier REPLACE, or None when there is none. */
  private def rewriteOne(sql: String): Option[String] = {
    val n = sql.length
    var i = 0
    while (i < n) {
      sql.charAt(i) match {
        case '\'' | '"' | '`' =>
          i = SqlText.quotedEnd(sql, i)
        case c if Character.toUpperCase(c) == 'R' &&
            i + 7 <= n && sql.substring(i, i + 7).equalsIgnoreCase("REPLACE") &&
            (i == 0 || !isWord(sql.charAt(i - 1))) &&
            (i + 7 == n || !isWord(sql.charAt(i + 7))) =>
          starBefore(sql, i).foreach { case (starIdx, exceptNames) =>
            return Some(expand(sql, starIdx, i, exceptNames))
          }
          i += 7
        case _ => i += 1
      }
    }
    None
  }

  /** If the token before `replIdx` is `*` or `* EXCEPT (...)`, the star's
    * index and any existing EXCEPT names; None otherwise.
    */
  private def starBefore(sql: String, replIdx: Int): Option[(Int, Seq[String])] = {
    var p = replIdx - 1
    while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p -= 1
    if (p < 0) None
    else if (sql.charAt(p) == '*') Some((p, Nil))
    else if (sql.charAt(p) == ')') {
      // walk back over the (...) group, then expect EXCEPT, then *
      var depth = 0
      var q = p
      while (q >= 0) {
        sql.charAt(q) match {
          case ')' => depth += 1
          case '(' =>
            depth -= 1
            if (depth == 0) {
              val names = sql.substring(q + 1, p).split(",").map(_.trim).toSeq
              var r = q - 1
              while (r >= 0 && Character.isWhitespace(sql.charAt(r))) r -= 1
              if (r >= 5 && sql.substring(r - 5, r + 1).equalsIgnoreCase("EXCEPT")) {
                var st = r - 6
                while (st >= 0 && Character.isWhitespace(sql.charAt(st))) st -= 1
                if (st >= 0 && sql.charAt(st) == '*') return Some((st, names))
              }
              return None
            }
          case _ =>
        }
        q -= 1
      }
      None
    } else None
  }

  private def expand(sql: String, starIdx: Int, replIdx: Int,
      exceptNames: Seq[String]): String = {
    var open = replIdx + 7
    while (open < sql.length && Character.isWhitespace(sql.charAt(open))) open += 1
    if (open >= sql.length || sql.charAt(open) != '(')
      throw new IllegalArgumentException(
        "star REPLACE requires a parenthesized list: * REPLACE (expr AS col, ...)")
    val close = matchingParen(sql, open)
    val items = SqlScan.splitTopLevel(sql.substring(open + 1, close), ",").map { item =>
      // the LAST top-level AS separates expression from target column
      val asPos = SqlScan.topLevel(item, "AS").lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"star REPLACE item '${item.trim}' must be 'expr AS col'"))
      val expr = item.substring(0, asPos).trim
      val name = item.substring(asPos + 2).trim
      if (name.isEmpty || !(name.forall(isWord) || (name.startsWith("`") && name.endsWith("`"))))
        throw new IllegalArgumentException(
          s"star REPLACE item '${item.trim}' must end in a plain column name")
      (expr, name)
    }
    val merged = (exceptNames ++ items.map(_._2))
      .filter(_.nonEmpty).distinct
    val star = sql.substring(starIdx, starIdx + 1) // "*" (qualifier stays before it)
    val repl = s"$star EXCEPT (${merged.mkString(", ")}), " +
      items.map { case (e, nm) => s"$e AS $nm" }.mkString(", ")
    sql.substring(0, starIdx) + repl + sql.substring(close + 1)
  }
}
