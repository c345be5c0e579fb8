package graft.plans

/** DuckDB's bracket list syntax for Spark:
  *
  *   [1, 2, 3]                          -> array(1, 2, 3)
  *   [expr FOR x IN list]               -> transform(list, x -> expr)
  *   [expr FOR x IN list IF cond]       -> transform(filter(list, x -> cond), x -> expr)
  *
  * A '[' is a list constructor only in EXPRESSION position (preceded by an
  * operator, comma, '(' or statement start); after an identifier, ')' or
  * ']' it is subscript/slice syntax. Plain subscripts stay untouched
  * (deliberately: DuckDB subscripts are 1-based and Spark's are 0-based —
  * a silent rewrite would flip valid Spark queries, so subscripts keep
  * host semantics and the `list_*` function aliases carry the 1-based
  * forms). Two subscript forms that are INVALID host syntax do get DuckDB
  * semantics, via the type-dispatching `graft_slice` expression: slice
  * syntax `x[a:b]` (1-based inclusive, negatives from the end, open ends)
  * and single subscripts on string LITERALS (`'abc'[2]`). Nested
  * comprehensions recurse; strings and quoted identifiers are never
  * scanned.
  */
object ListSyntax {

  def rewrite(sql: String): String = {
    if (!sql.contains('[')) return sql
    rec(sql)
  }

  private def rec(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val end = SqlText.quotedEnd(s, i)
          sb.append(s.substring(i, end)); i = end
        case '[' =>
          val close = matchingBracket(s, i)
          val inner = s.substring(i + 1, close)
          // subscript only when the bracket DIRECTLY follows its operand
          // (no whitespace): arr[1], f(x)[2], 'ab'[1] — a space before the
          // bracket puts it in expression position (SELECT [1, 2])
          val p = if (i > 0) s.charAt(i - 1) else 0.toChar
          val subscript = i > 0 &&
            (Character.isLetterOrDigit(p) || p == '_' || p == ')' || p == ']' ||
             p == '\'' || p == '"' || p == '`')
          if (subscript) {
            // Two DuckDB subscript forms that are INVALID host syntax get
            // DuckDB semantics via graft_slice (1-based inclusive, negative
            // from the end, open ends): slice syntax x[a:b] on any operand,
            // and single subscripts on STRING LITERALS ('abc'[2] — Spark
            // cannot subscript strings at all). Plain arr[i] stays host
            // 0-based, per the header note.
            val colon = topLevelColon(inner)
            val lp = if (colon.isDefined || p == '\'') SqlText.trailingPrimaryStart(sb) else sb.length
            if ((colon.isDefined || p == '\'') && lp < sb.length) {
              val operand = sb.substring(lp).trim
              sb.delete(lp, sb.length)
              colon match {
                case Some(ci) =>
                  val a = inner.substring(0, ci).trim
                  val b = inner.substring(ci + 1).trim
                  val aE = if (a.isEmpty) "CAST(NULL AS INT)" else rec(a)
                  val bE = if (b.isEmpty) "CAST(NULL AS INT)" else rec(b)
                  sb.append(s"graft_slice($operand, $aE, $bE)")
                case None =>
                  val iE = rec(inner)
                  sb.append(s"graft_slice($operand, $iE, $iE)")
              }
            } else sb.append('[').append(rec(inner)).append(']')
          } else sb.append(construct(inner))
          i = close + 1
        case _ =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Comprehension or plain list literal (contents already bracket-depth 0). */
  private def construct(inner: String): String = {
    topLevelWord(inner, "FOR") match {
      case Some(forIdx) =>
        val expr = rec(inner.substring(0, forIdx).trim)
        val rest = inner.substring(forIdx + 3)
        val inIdx = topLevelWord(rest, "IN").getOrElse(
          throw new IllegalArgumentException(
            s"list comprehension requires FOR <var> IN <list>: [$inner]"))
        val v = rest.substring(0, inIdx).trim
        if (!v.matches("""\w+""")) throw new IllegalArgumentException(
          s"list comprehension variable must be an identifier, got '$v'")
        val afterIn = rest.substring(inIdx + 2)
        val (listPart, condPart) = topLevelWord(afterIn, "IF") match {
          case Some(ifIdx) => (afterIn.substring(0, ifIdx), Some(afterIn.substring(ifIdx + 2)))
          case None => (afterIn, None)
        }
        val listExpr = rec(listPart.trim)
        condPart match {
          case Some(cond) =>
            s"transform(filter($listExpr, $v -> ${rec(cond.trim)}), $v -> $expr)"
          case None => s"transform($listExpr, $v -> $expr)"
        }
      case None =>
        if (inner.trim.isEmpty) "array()" else s"array(${rec(inner)})"
    }
  }

  /** Index of a single ':' (not '::') at depth 0, outside literals. */
  private def topLevelColon(s: String): Option[Int] = {
    var depth = 0
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          i = SqlText.quotedEnd(s, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case ':' if depth == 0 =>
          if (i + 1 < n && s.charAt(i + 1) == ':') i += 2 // '::' cast
          else return Some(i)
        case _ => i += 1
      }
    }
    None
  }

  /** Index of a keyword at paren/bracket depth 0, outside literals. */
  private def topLevelWord(s: String, w: String): Option[Int] = {
    var depth = 0
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          i = SqlText.quotedEnd(s, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case c if depth == 0 && Character.toUpperCase(c) == w.charAt(0) =>
          val end = i + w.length
          val before = i == 0 || (!Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_')
          if (before && end <= n && s.substring(i, end).equalsIgnoreCase(w) &&
              (end == n || (!Character.isLetterOrDigit(s.charAt(end)) && s.charAt(end) != '_')))
            return Some(i)
          i += 1
        case _ => i += 1
      }
    }
    None
  }

  private def matchingBracket(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          i = SqlText.quotedEnd(s, i) - 1
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced brackets in SQL text")
  }
}
