package graft.plans

import org.apache.spark.sql.SparkSession

/** DuckDB `getvariable('name')` → Spark's native session-variable
  * reference `system.session.name`.
  *
  * DuckDB session variables (`SET VARIABLE x = ...` / `getvariable('x')`,
  * shipped in the reference's embedded DuckDB 1.5.5) map onto Spark's SQL
  * variables: the SET VARIABLE statement intercept declares-and-assigns via
  * DECLARE OR REPLACE ... DEFAULT, and this rewrite turns the read call
  * into the typed native reference. An UNSET variable reads as NULL —
  * DuckDB's rule — via a bind-time existence probe (analysis only), the
  * same bind-time behavior as PivotRewrite's IN-value detection.
  */
object GetVariableRewrite {

  private val CallRe = """(?i)getvariable\s*\(\s*'([A-Za-z_][\w]*)'\s*\)""".r

  def rewrite(sql: String, spark: SparkSession): String =
    if (!sql.toLowerCase.contains("getvariable")) sql
    else CallRe.replaceAllIn(sql, m => {
      val name = m.group(1)
      val declared =
        try { spark.sql(s"SELECT system.session.`$name`").schema; true }
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      java.util.regex.Matcher.quoteReplacement(
        if (declared) s"system.session.`$name`" else "NULL")
    })
}
