package graft.engine

import graft.plans.SqlScan

/** DuckDB `CREATE MACRO` support: session-scoped SQL macros expanded by
  * textual inlining — which is exactly what DuckDB macros ARE (parameterized
  * expression/query templates, untyped). Spark 4's native SQL UDFs require
  * typed parameters, so they cannot host an untyped macro; inlining at the
  * statement layer preserves DuckDB's semantics (the expanded text then
  * flows through the dialect chain, guard, and optimizer like any query,
  * and Catalyst constant-folds / prunes the inlined expression normally).
  *
  * The reference engine ships DuckDB macros and its guard explicitly
  * declares it does NOT inspect them ("A view or macro that wraps a gated
  * function is not inspected",
  * `/root/reference/src/duckdb/admin_command_guard.h:53`). Inlining closes
  * that hole here: the EXPANDED text faces the statement guard, so a macro
  * cannot smuggle a gated construct past it.
  *
  * Scalar: `CREATE [OR REPLACE] [TEMP] MACRO add1(x) AS x + 1`
  * Table:  `CREATE MACRO topn(n) AS TABLE SELECT * FROM t LIMIT n`
  * Calls expand positionally, `p := v` named-call style and declared
  * defaults (`CREATE MACRO f(a, b := 2) AS a + b`) are supported; macros
  * may call macros (expansion iterates to a fixpoint, depth-capped).
  */
object Macros {

  final case class MacroDef(name: String, params: Seq[(String, Option[String])],
      body: String, isTable: Boolean)

  /** Per-session registry (DuckDB temp-macro scoping). */
  final class Registry {
    private val defs = new java.util.concurrent.ConcurrentHashMap[String, MacroDef]()
    def put(m: MacroDef, orReplace: Boolean): Unit = {
      if (!orReplace && defs.containsKey(m.name.toLowerCase))
        throw new IllegalArgumentException(s"macro ${m.name} already exists (use OR REPLACE)")
      defs.put(m.name.toLowerCase, m): Unit
    }
    def drop(name: String): Boolean = defs.remove(name.toLowerCase) != null
    def get(name: String): Option[MacroDef] = Option(defs.get(name.toLowerCase))
    def isEmpty: Boolean = defs.isEmpty
    def names: Seq[String] = {
      import scala.jdk.CollectionConverters._
      defs.values.asScala.map(_.name).toSeq.sorted
    }
  }

  private val CreateRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?MACRO\s+(\w+)\s*(\(.*)$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MACRO\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$""".r

  def handlesCreate(sql: String): Boolean = CreateRe.findFirstIn(sql).isDefined
  def handlesDrop(sql: String): Boolean = DropRe.findFirstIn(sql).isDefined

  /** Parse a CREATE MACRO statement into its definition. */
  def parseCreate(sql: String): (MacroDef, Boolean) = sql match {
    case CreateRe(orReplace, name, rest) =>
      val close = SqlScan.matchingParen(rest, 0)
      val params = {
        val inner = rest.substring(1, close).trim
        if (inner.isEmpty) Seq.empty
        else SqlScan.splitTopLevel(inner, ",").map { p =>
          val parts = p.split(":=", 2)
          if (parts.length == 2) (parts(0).trim, Some(parts(1).trim))
          else (p.trim, None)
        }
      }
      params.foreach { case (n, _) =>
        if (!n.matches("""\w+""")) throw new IllegalArgumentException(
          s"macro parameter '$n' must be a plain identifier") }
      // required parameters must precede defaulted ones (positional fill)
      val firstDefault = params.indexWhere(_._2.isDefined)
      if (firstDefault >= 0 && params.drop(firstDefault).exists(_._2.isEmpty))
        throw new IllegalArgumentException(
          "macro parameters with defaults must come after required ones")
      val afterParams = rest.substring(close + 1).trim
      if (!(afterParams.length >= 2 && afterParams.substring(0, 2).equalsIgnoreCase("AS")))
        throw new IllegalArgumentException("CREATE MACRO requires AS <expression|TABLE query>")
      val bodyRaw = afterParams.substring(2).trim.stripSuffix(";").trim
      val isTable = bodyRaw.length >= 6 && bodyRaw.substring(0, 5).equalsIgnoreCase("TABLE") &&
        !Character.isLetterOrDigit(bodyRaw.charAt(5))
      val body = if (isTable) bodyRaw.substring(5).trim else bodyRaw
      (MacroDef(name, params, body, isTable), orReplace != null)
    case _ => throw new IllegalArgumentException("cannot parse CREATE MACRO statement")
  }

  def parseDrop(sql: String): String = sql match {
    case DropRe(name) => name
    case _ => throw new IllegalArgumentException("cannot parse DROP MACRO statement")
  }

  /** Expand every registered-macro call in `sql` by textual inlining,
    * iterating so macros may call macros. Unknown names are untouched.
    */
  def expand(sql: String, reg: Registry, maxDepth: Int = 10): String = {
    if (reg.isEmpty) return sql
    var cur = sql
    var depth = 0
    while (depth < maxDepth) {
      val next = expandOnce(cur, reg)
      if (next == cur) return cur
      cur = next
      depth += 1
    }
    throw new IllegalArgumentException(
      s"macro expansion did not terminate in $maxDepth rounds (recursive macro?)")
  }

  private def expandOnce(sql: String, reg: Registry): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val j = sql.indexOf(c, i + 1)
          val end = if (j < 0) n else j + 1
          sb.append(sql.substring(i, end)); i = end
        case ch if Character.isLetter(ch) || ch == '_' =>
          var j = i
          while (j < n && (Character.isLetterOrDigit(sql.charAt(j)) || sql.charAt(j) == '_')) j += 1
          val word = sql.substring(i, j)
          val prevDot = i > 0 && sql.charAt(i - 1) == '.'
          var k = j
          while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
          reg.get(word) match {
            case Some(m) if !prevDot && k < n && sql.charAt(k) == '(' =>
              val close = SqlScan.matchingParen(sql, k)
              val argText = sql.substring(k + 1, close).trim
              val args = if (argText.isEmpty) Seq.empty
                else SqlScan.splitTopLevel(argText, ",").map(_.trim)
              sb.append(apply(m, args))
              i = close + 1
            case _ => sb.append(word); i = j
          }
        case _ => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Bind call arguments (positional, then `p := v` named, then declared
    * defaults) and substitute them into the body.
    */
  private val NamedArgRe = """(?s)^\s*\w+\s*:=.*$""".r

  private def apply(m: MacroDef, args: Seq[String]): String = {
    // named only when the arg ITSELF is `param := value` — a ':=' buried in
    // a string literal or nested call keeps the arg positional
    val (named, positional) = args.partition(a => NamedArgRe.matches(a))
    val bindings = scala.collection.mutable.Map.empty[String, String]
    positional.zipWithIndex.foreach { case (a, idx) =>
      if (idx >= m.params.length) throw new IllegalArgumentException(
        s"macro ${m.name} takes ${m.params.length} arguments, got ${args.length}")
      bindings(m.params(idx)._1.toLowerCase) = a
    }
    named.foreach { a =>
      val parts = a.split(":=", 2)
      val pname = parts(0).trim
      if (!m.params.exists(_._1.equalsIgnoreCase(pname)))
        throw new IllegalArgumentException(s"macro ${m.name} has no parameter '$pname'")
      bindings(pname.toLowerCase) = parts(1).trim
    }
    m.params.foreach { case (p, dflt) =>
      if (!bindings.contains(p.toLowerCase)) dflt match {
        case Some(d) => bindings(p.toLowerCase) = d
        case None => throw new IllegalArgumentException(
          s"macro ${m.name}: missing argument for parameter '$p'")
      }
    }
    val substituted = substitute(m.body, bindings.toMap)
    s"($substituted)"
  }

  /** Replace parameter identifiers in the body (outside literals, not
    * qualified, not a function-call name) with the parenthesized argument.
    */
  private def substitute(body: String, bindings: Map[String, String]): String = {
    val sb = new StringBuilder
    var i = 0
    val n = body.length
    while (i < n) {
      val c = body.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val j = body.indexOf(c, i + 1)
          val end = if (j < 0) n else j + 1
          sb.append(body.substring(i, end)); i = end
        case ch if Character.isLetter(ch) || ch == '_' =>
          var j = i
          while (j < n && (Character.isLetterOrDigit(body.charAt(j)) || body.charAt(j) == '_')) j += 1
          val word = body.substring(i, j)
          val prevDot = i > 0 && body.charAt(i - 1) == '.'
          val nextCh = body.indexWhere(!_.isWhitespace, j)
          val isCall = nextCh >= 0 && body.charAt(nextCh) == '('
          bindings.get(word.toLowerCase) match {
            case Some(arg) if !prevDot && !isCall => sb.append(s"($arg)")
            case _ => sb.append(word)
          }
          i = j
        case _ => sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
