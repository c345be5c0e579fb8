package graft.plans

import org.apache.spark.sql.SparkSession

/** DuckDB's `PIVOT` statement syntax:
  *
  *   PIVOT tbl ON col [IN (v1, ...)] USING agg(x) [AS a][, ...] [GROUP BY g, ...]
  *
  * rewritten onto Spark's relation-level PIVOT clause:
  *
  *   SELECT * FROM <projected tbl> PIVOT (agg(x) [AS a] FOR col IN (v1, ...))
  *
  * When the IN list is omitted, the distinct pivot values are queried
  * first — the same bind-time scan DuckDB's auto-pivot performs — capped
  * at 1000 (a pivot wider than that is a data problem, not a query), with
  * NULL skipped (neither engine emits a NULL column). A GROUP BY subset
  * becomes an inner projection of the group columns + pivot column + the
  * aggregates' argument columns (argument must be a plain column in that
  * form, like DuckDB's own simple-pivot path). The value scan runs through
  * `preAnalyze` (the statement guard) first.
  */
object PivotRewrite {
  import SqlScan._

  def rewrite(sql: String, spark: SparkSession,
      preAnalyze: String => Unit = _ => ()): String = {
    val t = sql.dropWhile(_.isWhitespace)
    if (!(t.length >= 6 && t.substring(0, 5).equalsIgnoreCase("PIVOT") &&
        Character.isWhitespace(t.charAt(5)))) return sql
    val body = t.stripSuffix(";")
    val onIdx = topLevel(body, "ON").headOption.getOrElse(
      throw new IllegalArgumentException("PIVOT statement requires ON <column>"))
    val usingIdx = topLevel(body, "USING").headOption.getOrElse(
      throw new IllegalArgumentException("PIVOT statement requires USING <aggregate>"))
    val groupIdx = topLevel(body, "GROUP").headOption
    val inIdx = topLevel(body, "IN").find(i => i > onIdx && i < usingIdx)

    val rel = body.substring(5, onIdx).trim
    val col = body.substring(onIdx + 2, inIdx.getOrElse(usingIdx)).trim
    val inList = inIdx.map { i =>
      val open = body.indexOf('(', i)
      require(open >= 0 && open < usingIdx, "PIVOT IN requires a parenthesized list")
      body.substring(open + 1, matchingParen(body, open)).trim
    }
    val aggs = body.substring(usingIdx + 5, groupIdx.getOrElse(body.length)).trim
    val groupCols = groupIdx.map(i =>
      splitTopLevel(body.substring(i + 5).trim.replaceFirst("(?i)^BY\\b", ""), ",")
        .map(_.trim))

    if (!col.matches("""[\w.]+""")) throw new IllegalArgumentException(
      s"PIVOT ON column must be a plain column, got '$col'")

    // inner relation: as-is, or projected down to group + pivot + agg args
    val inner = groupCols match {
      case None => if (rel.startsWith("(")) s"$rel __piv" else rel
      case Some(gs) =>
        val argRe = """(?is)^\s*\w+\s*\(\s*([\w.*]+)\s*\)\s*(?:AS\s+\w+)?\s*$""".r
        val args = splitTopLevel(aggs, ",").map {
          case argRe(a) => a
          case other => throw new IllegalArgumentException(
            s"PIVOT ... GROUP BY requires plain-column aggregates, got '${other.trim}'")
        }.filterNot(_ == "*")
        val cols = (gs ++ Seq(col) ++ args).distinct.mkString(", ")
        s"(SELECT $cols FROM ${if (rel.startsWith("(")) s"$rel __piv0" else rel}) __piv"
    }

    val values = inList.getOrElse {
      val q = s"SELECT DISTINCT $col AS __pv FROM ${if (rel.startsWith("(")) s"$rel __pvq" else rel} " +
        s"WHERE $col IS NOT NULL ORDER BY 1 LIMIT 1001"
      preAnalyze(q)
      val rows = spark.sql(q).collect()
      if (rows.length > 1000) throw new IllegalArgumentException(
        "PIVOT auto-detected more than 1000 distinct values — supply an explicit IN list")
      if (rows.isEmpty) throw new IllegalArgumentException(
        s"PIVOT found no non-NULL values in $col")
      rows.map(r => literal(r.get(0))).mkString(", ")
    }

    s"SELECT * FROM $inner PIVOT ($aggs FOR $col IN ($values))"
  }

  private def literal(v: Any): String = v match {
    // backslash must escape too: Spark's default parser treats \' as an
    // escaped quote, so a data value ending in '\' would swallow the
    // closing quote and re-interpret the rest of the generated statement
    // (data-driven injection). Escape backslash first, then the quote.
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case t: java.time.LocalDate => s"DATE '$t'"
    case t: java.time.LocalDateTime => s"TIMESTAMP '${t.toString.replace('T', ' ')}'"
    case t: java.time.Instant => s"TIMESTAMP '${t.toString.replace("T", " ").stripSuffix("Z")}'"
    case b: Boolean => b.toString
    case n => n.toString
  }
}
