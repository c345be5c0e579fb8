package graft.plans

import org.apache.spark.sql.SparkSession

/** DuckDB's `COLUMNS(...)` star expression: a select item containing
  * `COLUMNS(*)` or `COLUMNS('regex')` expands into one copy per matching
  * column of the FROM relation, with the COLUMNS call replaced by the
  * column reference and the item aliased to the COLUMN name — DuckDB's own
  * naming (`SELECT MIN(COLUMNS('n_.*'))` emits columns named n_..., not
  * min(...)). Multiple COLUMNS calls with the same argument inside one
  * item expand in lockstep (`COLUMNS(*) IS NULL OR COLUMNS(*) = 0`).
  *
  * The FROM relation's schema comes from analysis only (`SELECT * FROM
  * <from-clause>`, guard-checked via `preAnalyze`); the regex uses
  * unanchored search semantics like DuckDB's. Scope: the outer select
  * list of a single SELECT statement (subquery usage — rare in practice —
  * is declared unsupported and surfaces as Spark's own resolution error).
  */
object ColumnsRewrite {
  import SqlScan._

  def rewrite(sql: String, spark: SparkSession,
      preAnalyze: String => Unit = _ => ()): String = {
    if (!hasColumnsCall(sql)) return sql
    val selIdx = topLevel(sql, "SELECT").headOption.getOrElse(return sql)
    val fromIdx = topLevel(sql, "FROM").find(_ > selIdx).getOrElse(return sql)
    val stops = Seq("WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW",
      "ORDER", "LIMIT", "UNION", "INTERSECT", "EXCEPT")
    val fromEnd = stops.flatMap(k => topLevel(sql, k)).filter(_ > fromIdx)
      .sorted.headOption.getOrElse(sql.length)
    val fromText = sql.substring(fromIdx + 4, fromEnd).trim

    val probe = s"SELECT * FROM $fromText"
    preAnalyze(probe)
    val names = spark.sql(probe).schema.fields.map(_.name)

    // DISTINCT applies once to the whole select list, never per expansion
    val selListRaw = sql.substring(selIdx + 6, fromIdx)
    val distinctRe = """(?is)^\s*DISTINCT\b""".r
    val (prefix, selList) = distinctRe.findFirstIn(selListRaw) match {
      case Some(d) => ("DISTINCT ", selListRaw.substring(d.length))
      case None => ("", selListRaw)
    }
    val items = splitTopLevel(selList, ",").map { item =>
      findCall(item) match {
        case None => item.trim
        case Some(call) =>
          val arg = call.substring(call.indexOf('(') + 1, call.length - 1).trim
          val matched =
            if (arg == "*") names.toSeq
            else if (arg.length >= 2 && arg.head == '\'' && arg.last == '\'') {
              val re = arg.substring(1, arg.length - 1).r.unanchored
              names.toSeq.filter(n => re.findFirstIn(n).isDefined)
            } else throw new IllegalArgumentException(
              s"COLUMNS argument must be * or a 'regex' string, got '$arg'")
          if (matched.isEmpty) throw new IllegalArgumentException(
            s"COLUMNS($arg) matched no columns of the FROM relation")
          // only lockstep expansion is defined: a SECOND call with a
          // different argument in the same item has no column pairing
          val leftover = findCall(item.replace(call, ""))
          if (leftover.isDefined) throw new IllegalArgumentException(
            s"multiple COLUMNS(...) with different arguments in one select " +
            s"item are not supported: '${item.trim}'")
          matched.map { c =>
            s"${item.trim.replace(call, q(c))} AS ${q(c)}"
          }.mkString(", ")
      }
    }
    sql.substring(0, selIdx) + "SELECT " + prefix + items.mkString(", ") + " " +
      sql.substring(fromIdx)
  }

  /** The full text of the first `COLUMNS(...)` call in `item`, if any. */
  private def findCall(item: String): Option[String] = {
    var i = 0
    val n = item.length
    while (i < n) {
      val c = item.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          i = SqlText.quotedEnd(item, i)
        case ch if (Character.toUpperCase(ch) == 'C') &&
            i + 7 <= n && item.substring(i, i + 7).equalsIgnoreCase("COLUMNS") &&
            (i == 0 || (!Character.isLetterOrDigit(item.charAt(i - 1)) && item.charAt(i - 1) != '_')) =>
          var k = i + 7
          while (k < n && Character.isWhitespace(item.charAt(k))) k += 1
          if (k < n && item.charAt(k) == '(') {
            val close = matchingParen(item, k)
            return Some(item.substring(i, close + 1))
          }
          i += 7
        case _ => i += 1
      }
    }
    None
  }

  private def hasColumnsCall(sql: String): Boolean = findCall(sql).isDefined
}
