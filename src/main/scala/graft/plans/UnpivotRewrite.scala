package graft.plans

/** DuckDB's `UNPIVOT` statement syntax:
  *
  *   UNPIVOT tbl ON c1, c2, ... INTO NAME n VALUE v
  *
  * rewritten onto Spark's relation-level UNPIVOT clause:
  *
  *   SELECT * FROM tbl UNPIVOT (v FOR n IN (c1, c2, ...))
  *
  * Pure text (both engines exclude NULL values by default, and both keep
  * every non-ON column as an identifier column), so no session needed.
  */
object UnpivotRewrite {
  import SqlScan._

  def rewrite(sql: String): String = {
    val t = sql.dropWhile(_.isWhitespace)
    if (!(t.length >= 8 && t.substring(0, 7).equalsIgnoreCase("UNPIVOT") &&
        Character.isWhitespace(t.charAt(7)))) return sql
    val body = t.stripSuffix(";")
    val onIdx = topLevel(body, "ON").headOption.getOrElse(
      throw new IllegalArgumentException("UNPIVOT statement requires ON <columns>"))
    val intoIdx = topLevel(body, "INTO").headOption.getOrElse(
      throw new IllegalArgumentException("UNPIVOT statement requires INTO NAME <n> VALUE <v>"))
    val rel = body.substring(7, onIdx).trim
    val cols = body.substring(onIdx + 2, intoIdx).trim
    val IntoRe = """(?is)^\s*NAME\s+(\w+|`[^`]+`)\s+VALUE\s+(\w+|`[^`]+`)\s*$""".r
    body.substring(intoIdx + 4) match {
      case IntoRe(n, v) =>
        val r = if (rel.startsWith("(")) s"$rel __unpiv" else rel
        s"SELECT * FROM $r UNPIVOT ($v FOR $n IN ($cols))"
      case other => throw new IllegalArgumentException(
        s"cannot parse UNPIVOT INTO clause: '${other.trim}' (expected NAME <n> VALUE <v>)")
    }
  }
}
