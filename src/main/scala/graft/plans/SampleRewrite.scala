package graft.plans

/** DuckDB `USING SAMPLE` → Spark `TABLESAMPLE`.
  *
  * Forms handled (DuckDB sample clause, any depth, outside literals):
  *   USING SAMPLE 10%                    -> TABLESAMPLE (10 PERCENT)
  *   USING SAMPLE 10 PERCENT             -> TABLESAMPLE (10 PERCENT)
  *   USING SAMPLE 100 [ROWS]             -> TABLESAMPLE (100 ROWS)
  *   USING SAMPLE reservoir(10%)         -> TABLESAMPLE (10 PERCENT)
  *   USING SAMPLE 10% (bernoulli, 42)    -> TABLESAMPLE (10 PERCENT) REPEATABLE (42)
  *
  * The sampling METHOD is dropped: Spark's TABLESAMPLE is its own
  * implementation, and no method produces cross-engine-identical rows
  * anyway (the deterministic alternative both engines agree on is the
  * `sample_hash` operator's md5-threshold filter). A seed maps to
  * REPEATABLE so repeated runs in THIS engine are stable.
  */
object SampleRewrite {

  // Two explicit forms so the closing paren is only ever consumed when the
  // METHOD form opened one — a lone optional \)? would eat an enclosing
  // subquery's ')' after `... USING SAMPLE 10%)` and unbalance the text.
  //   method form:  reservoir(10%)       groups (1 method, 2 num, 3 unit)
  //   bare form:    10% | 100 [ROWS]     groups (4 num, 5 unit)
  // optional trailing (method [, seed]) -> groups (6, 7)
  private val ClauseRe =
    ("""(?is)USING\s+SAMPLE\s+(?:(\w+)\s*\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?\s*\)""" +
     """|(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?)""" +
     """(?:\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\))?""").r

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase.contains("USING")) return sql
    // token scan: only rewrite occurrences outside string literals
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val end = SqlText.quotedEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case 'u' | 'U' =>
          ClauseRe.findPrefixMatchOf(sql.subSequence(i, n)) match {
            case Some(m) if i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)) =>
              val num = Option(m.group(2)).getOrElse(m.group(4))
              val unit = Option(m.group(3)).orElse(Option(m.group(5)))
                .map(_.trim.toUpperCase).getOrElse("")
              val pct = unit == "%" || unit == "PERCENT"
              val seed = Option(m.group(7))
              sb.append(if (pct) s"TABLESAMPLE ($num PERCENT)" else s"TABLESAMPLE ($num ROWS)")
              seed.foreach(s => sb.append(s" REPEATABLE ($s)"))
              i += m.end
            case _ => sb.append(c); i += 1
          }
        case _ => sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
