package graft.plans

/** DuckDB's brace literals for Spark:
  *
  *   {'a': 1, 'b': x}            -> named_struct('a', 1, 'b', x)
  *   MAP {'k1': v1, 'k2': v2}    -> map('k1', v1, 'k2', v2)
  *
  * Identifier keys in the struct form quote to their string names (DuckDB
  * allows both spellings); map keys are arbitrary expressions and pass
  * through. Nested braces recurse; strings and quoted identifiers are
  * never scanned. Values may contain `::` casts — the pair splits at the
  * FIRST single colon after the key token, so a cast colon never splits a
  * pair.
  */
object StructSyntax {

  def rewrite(sql: String): String = {
    if (!sql.contains('{')) return sql
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
        case '{' =>
          val close = matchingBrace(s, i)
          val inner = s.substring(i + 1, close)
          // a MAP keyword directly before the brace selects the map form
          val isMap = {
            var e = sb.length
            while (e > 0 && Character.isWhitespace(sb.charAt(e - 1))) e -= 1
            var st = e
            while (st > 0 && (Character.isLetterOrDigit(sb.charAt(st - 1)) || sb.charAt(st - 1) == '_')) st -= 1
            if (e > st && sb.substring(st, e).equalsIgnoreCase("MAP") &&
                (st == 0 || !Character.isLetterOrDigit(sb.charAt(st - 1)))) {
              sb.delete(st, sb.length); true
            } else false
          }
          sb.append(construct(inner, isMap))
          i = close + 1
        case _ =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def construct(inner: String, isMap: Boolean): String = {
    val pairs = splitTop(inner).map(_.trim).filter(_.nonEmpty)
    if (pairs.isEmpty) throw new IllegalArgumentException(
      "empty brace literal {} is not supported")
    val parts = pairs.map { p =>
      val (key, value) = splitPair(p)
      val k =
        if (isMap) rec(key)
        else if (key.startsWith("'")) key
        else if (key.matches("""[A-Za-z_]\w*""")) s"'$key'"
        else throw new IllegalArgumentException(
          s"struct key must be a quoted string or identifier, got '$key'")
      s"$k, ${rec(value)}"
    }
    val fn = if (isMap) "map" else "named_struct"
    s"$fn(${parts.mkString(", ")})"
  }

  /** Split `key: value` at the first top-level single colon after the key
    * (never inside a `::` cast, a string, or nested parens/brackets).
    */
  private def splitPair(p: String): (String, String) = {
    var depth = 0
    var i = 0
    val n = p.length
    while (i < n) {
      p.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          i = SqlText.quotedEnd(p, i)
        case '(' | '[' | '{' => depth += 1; i += 1
        case ')' | ']' | '}' => depth -= 1; i += 1
        case ':' if depth == 0 =>
          if (i + 1 < n && p.charAt(i + 1) == ':') i += 2 // :: cast
          else return (p.substring(0, i).trim, p.substring(i + 1).trim)
        case _ => i += 1
      }
    }
    throw new IllegalArgumentException(s"brace literal entry needs 'key: value', got '$p'")
  }

  /** Split on top-level commas (outside quotes and nesting). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          val end = SqlText.quotedEnd(s, i)
          cur.append(s.substring(i, end)); i = end
        case '(' | '[' | '{' => depth += 1; cur.append(s.charAt(i)); i += 1
        case ')' | ']' | '}' => depth -= 1; cur.append(s.charAt(i)); i += 1
        case ',' if depth == 0 => out += cur.toString; cur.clear(); i += 1
        case c => cur.append(c); i += 1
      }
    }
    out += cur.toString
    out.toSeq
  }

  private def matchingBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case c @ ('\'' | '"' | '`') =>
          i = SqlText.quotedEnd(s, i) - 1
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced braces in SQL text")
  }
}
