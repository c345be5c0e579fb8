package graft.plans

/** The DuckDB-dialect statement rewrite chain, in dependency order:
  * file-reading table functions first (so the guard's local-scan gate sees
  * path scans), then `* EXCLUDE` → `* EXCEPT` (so QUALIFY's set-operation
  * detection sees Spark's star spelling), then QUALIFY desugaring. One
  * entry point so every SQL-accepting surface — direct statements, prepared
  * statements, COPY's inner query — applies identical dialect semantics.
  */
object Dialect {
  def rewrite(sql: String): String =
    QualifyRewrite.rewrite(StarExclude.rewrite(TableFunctions.rewrite(sql)))
}
