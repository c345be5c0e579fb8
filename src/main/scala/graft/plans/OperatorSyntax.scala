package graft.plans

/** Quote-aware SQL-text scanning shared by the operator-level rewrites:
  * locating the trailing primary expression of an emitted prefix (the left
  * operand of an infix rewrite) and the end of the primary that FOLLOWS a
  * position (the right operand). A "primary chain" is a word / quoted
  * literal / parenthesized group plus any DIRECTLY-attached continuations
  * (`.field`, call parens, subscripts) — the same no-whitespace adjacency
  * rule ListSyntax uses to recognize subscripts, so both rewrites agree on
  * what an operand is. Group skipping is quote-aware in both directions of
  * use (always scanned forward), so parens inside string literals never
  * miscount.
  */
private[plans] object SqlText {

  /** End (exclusive) of the quoted literal opening at `from`. Honors the
    * input dialect's escaping rules — backslash escapes inside '…' string
    * literals (so 'a\'b(' cannot end early and desync a caller's
    * paren/cast stack, ADVICE r9) and doubled quotes in all three styles.
    * Double quotes delimit IDENTIFIERS in the DuckDB/Postgres input dialect,
    * where backslash is an ordinary character — treating it as an escape
    * made an identifier with a trailing backslash scan past its closing
    * quote (ADVICE r10) — so "…" and `…` get doubled-quote handling only.
    */
  private def quoteEnd(s: CharSequence, from: Int, q: Char): Int = {
    var j = from + 1
    val n = s.length
    while (j < n) {
      val c = s.charAt(j)
      if (c == '\\' && q == '\'' && j + 1 < n) j += 2
      else if (c == q) {
        if (j + 1 < n && s.charAt(j + 1) == q) j += 2
        else return j + 1
      } else j += 1
    }
    n
  }

  /** Public form: `s.charAt(from)` must be the opening quote char. */
  def quotedEnd(s: CharSequence, from: Int): Int =
    quoteEnd(s, from, s.charAt(from))

  /** End index (exclusive) of the balanced ()/[] group opening at `from`. */
  private def groupEnd(s: CharSequence, from: Int): Int = {
    var depth = 0
    var j = from
    val n = s.length
    while (j < n) {
      val c = s.charAt(j)
      if (c == '\'' || c == '"' || c == '`') j = quoteEnd(s, j, c) - 1
      else if (c == '(' || c == '[') depth += 1
      else if (c == ')' || c == ']') { depth -= 1; if (depth == 0) return j + 1 }
      j += 1
    }
    n
  }

  private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'

  /** Start index of the trailing primary chain of `s` (== s.length when the
    * text ends in an operator / is empty). The scan is bounded to the
    * INNERMOST UNCLOSED group: in `f(a, b` the trailing primary is `b`,
    * never the unbalanced `f(...` prefix — the prefix being scanned is
    * usually the partially-emitted text before a subscript/operator.
    */
  def trailingPrimaryStart(s: CharSequence): Int = {
    val n = s.length
    // Find the innermost unclosed '(' / '[' (quote-aware) and start after it.
    val base: Int = {
      var j = 0
      var stack = List.empty[Int]
      while (j < n) {
        val c = s.charAt(j)
        if (c == '\'' || c == '"' || c == '`') j = quoteEnd(s, j, c) - 1
        else if (c == '(' || c == '[') stack = j :: stack
        else if (c == ')' || c == ']') stack = if (stack.isEmpty) stack else stack.tail
        j += 1
      }
      stack.headOption.map(_ + 1).getOrElse(0)
    }
    var i = base
    var ps = n
    var prev: Char = 0 // 'w' word/quote, ')' group, '.', or the operator char
    var prevEnd = -1   // index just after the previous token (adjacency check)
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '\'' || c == '"' || c == '`') {
        ps = i
        val e = quoteEnd(s, i, c); i = e; prev = 'w'; prevEnd = e
      } else if (isWordChar(c)) {
        if (!(prev == '.' && prevEnd == i)) ps = i
        var e = i + 1
        while (e < n && isWordChar(s.charAt(e))) e += 1
        i = e; prev = 'w'; prevEnd = e
      } else if (c == '(' || c == '[') {
        if (!((prev == 'w' || prev == ')') && prevEnd == i)) ps = i
        val e = groupEnd(s, i); i = e; prev = ')'; prevEnd = e
      } else if (c == '.') {
        // numeric / qualified-name continuation only when directly attached
        if (!(prev == 'w' && prevEnd == i)) ps = i
        i += 1; prev = '.'; prevEnd = i
      } else {
        i += 1; prev = c; prevEnd = i
      }
    }
    ps
  }

  /** End index (exclusive) of the primary chain starting at/after `from`
    * (skips leading whitespace and unary +/-).
    */
  def primaryEnd(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    def skipWs(): Unit = while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    skipWs()
    while (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+')) { i += 1; skipWs() }
    if (i >= n) return i
    val c = s.charAt(i)
    if (c == '\'' || c == '"' || c == '`') i = quoteEnd(s, i, c)
    else if (c == '(') i = groupEnd(s, i)
    else if (isWordChar(c)) { while (i < n && isWordChar(s.charAt(i))) i += 1 }
    else return i
    var cont = true
    while (cont && i < n) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          while (i < n && isWordChar(s.charAt(i))) i += 1
        case '(' | '[' => i = groupEnd(s, i)
        case _ => cont = false
      }
    }
    i
  }
}

/** DuckDB operator spellings Spark's parser rejects, as quote-aware text
  * rewrites (each target is INVALID host syntax, so no valid Spark query
  * changes meaning):
  *
  *   a // b        -> a div b        (integer division; DuckDB floors
  *                                    doubles to a double — declared
  *                                    narrowing: div yields a long)
  *   a ** b        -> power(a, b)    (left-associative, like Postgres `^`;
  *                                    operands are primary chains — the
  *                                    same adjacency rule as subscripts)
  *   VARCHAR       -> STRING         (CAST POSITIONS ONLY — after `::` or
  *                                    as `AS VARCHAR` inside CAST/TRY_CAST:
  *                                    Spark accepts only parameterized
  *                                    VARCHAR(n) there. Identifier positions
  *                                    stay untouched: `varchar` is a legal
  *                                    Spark column/alias name, so a blanket
  *                                    rewrite would corrupt
  *                                    `SELECT varchar FROM t`)
  *
  * DuckDB's `^` (power there, XOR here) deliberately keeps host semantics:
  * rewriting it would flip valid Spark queries — same policy as 1-based
  * subscripts in ListSyntax.
  */
object OperatorSyntax {

  def rewrite(sql: String): String = {
    if (!sql.contains("//") && !sql.contains("**") &&
      !containsIgnoreCase(sql, "varchar")) return sql
    val s = sql
    val n = s.length
    val sb = new StringBuilder
    var i = 0
    // cast-context stack for SOURCE parens: true = opened right after
    // CAST/TRY_CAST (parens emitted by the ** -> power() rewrite never pass
    // through here, and any source parens inside a ** operand are balanced,
    // so the stack stays in sync with nesting depth)
    var castStack: List[Boolean] = Nil
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    // last word already emitted to sb (skipping trailing whitespace)
    def prevWord: String = {
      var e = sb.length
      while (e > 0 && Character.isWhitespace(sb.charAt(e - 1))) e -= 1
      var b = e
      while (b > 0 && isWordChar(sb.charAt(b - 1))) b -= 1
      sb.substring(b, e)
    }
    // do the already-emitted non-ws chars end with `::`?
    def afterCastOp: Boolean = {
      var e = sb.length
      while (e > 0 && Character.isWhitespace(sb.charAt(e - 1))) e -= 1
      e >= 2 && sb.charAt(e - 1) == ':' && sb.charAt(e - 2) == ':'
    }
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val end = SqlText.quotedEnd(s, i)
          sb.append(s.substring(i, end)); i = end
        case '/' if i + 1 < n && s.charAt(i + 1) == '/' =>
          sb.append(" div "); i += 2
        case '*' if i + 1 < n && s.charAt(i + 1) == '*' =>
          val lp = SqlText.trailingPrimaryStart(sb)
          val left = if (lp < sb.length) sb.substring(lp).trim else ""
          val re = SqlText.primaryEnd(s, i + 2)
          val right = s.substring(i + 2, re).trim
          if (left.isEmpty || right.isEmpty) { sb.append("**"); i += 2 }
          else {
            sb.delete(lp, sb.length)
            sb.append(s"power($left, $right)")
            i = re
          }
        case '(' =>
          val w = prevWord.toUpperCase
          castStack = (w == "CAST" || w == "TRY_CAST") :: castStack
          sb.append(c); i += 1
        case ')' =>
          if (castStack.nonEmpty) castStack = castStack.tail
          sb.append(c); i += 1
        case 'v' | 'V' if i + 7 <= n && s.substring(i, i + 7).equalsIgnoreCase("varchar") &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + 7 == n || !isWordChar(s.charAt(i + 7))) && {
              var k = i + 7
              while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
              k >= n || s.charAt(k) != '('
            } && (afterCastOp ||
              (prevWord.equalsIgnoreCase("AS") && castStack.headOption.contains(true))) =>
          sb.append("STRING"); i += 7
        case _ =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def containsIgnoreCase(s: String, w: String): Boolean = {
    var i = 0
    while (i + w.length <= s.length) {
      if (s.substring(i, i + w.length).equalsIgnoreCase(w)) return true
      i += 1
    }
    false
  }
}
