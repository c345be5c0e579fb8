package graft.plans

/** Shared token-aware SQL text scanning for the dialect rewrites: keyword
  * positions at parenthesis depth 0 and outside '...' / "..." literals, and
  * matching-paren / top-level-split helpers. The same scanning discipline as
  * [[QualifyRewrite]] (subqueries, OVER(...) clauses, and string literals are
  * never touched), factored out for the rewrites that need more than one
  * keyword.
  */
object SqlScan {

  /** Positions of top-level (depth-0, outside literals) matches of `word`. */
  def topLevel(sql: String, word: String): List[Int] = {
    val out = List.newBuilder[Int]
    var depth = 0
    var i = 0
    val n = sql.length
    val w = word.toUpperCase
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < n && sql.charAt(i) != '\'') i += 1
        case '"' =>
          i += 1
          while (i < n && sql.charAt(i) != '"') i += 1
        case '`' =>
          i += 1
          while (i < n && sql.charAt(i) != '`') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && Character.toUpperCase(c) == w.charAt(0) =>
          val end = i + w.length
          // word-boundary checks only apply to word-like separators; a
          // punctuation separator (e.g. ",") matches wherever it appears
          val wordLike = Character.isLetterOrDigit(w.charAt(0)) || w.charAt(0) == '_'
          val before = !wordLike || i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)) &&
            sql.charAt(i - 1) != '_'
          if (before && end <= n && sql.substring(i, end).equalsIgnoreCase(w) &&
              (!wordLike || end == n || (!Character.isLetterOrDigit(sql.charAt(end)) &&
                sql.charAt(end) != '_'))) {
            out += i
            i = end - 1
          }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Split `sql` on every top-level occurrence of keyword `sep` (e.g. AND). */
  def splitTopLevel(sql: String, sep: String): List[String] = {
    val cuts = topLevel(sql, sep)
    if (cuts.isEmpty) List(sql)
    else {
      val bounds = (-sep.length :: cuts) :+ sql.length
      bounds.sliding(2).map { case List(a, b) =>
        sql.substring(a + sep.length, b)
      }.toList
    }
  }

  /** Index of the ')' matching the '(' at `open` (which must be '('). */
  def matchingParen(sql: String, open: Int): Int = {
    require(sql.charAt(open) == '(', s"expected '(' at $open")
    var depth = 0
    var i = open
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < n && sql.charAt(i) != '\'') i += 1
        case '"' =>
          i += 1
          while (i < n && sql.charAt(i) != '"') i += 1
        case '`' =>
          i += 1
          while (i < n && sql.charAt(i) != '`') i += 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in SQL text")
  }

  /** Backtick-quote an identifier for generated Spark SQL. */
  def q(name: String): String = "`" + name.replace("`", "``") + "`"
}
