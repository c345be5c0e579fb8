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
    QualifyRewrite.rewrite(DistinctOnRewrite.rewrite(StarReplace.rewrite(StarExclude.rewrite(
      SampleRewrite.rewrite(ListSyntax.rewrite(StructSyntax.rewrite(TableFunctions.rewrite(
        FromFirstRewrite.rewrite(JoinKeywords.rewrite(UnpivotRewrite.rewrite(
          FunctionRenames.rewrite(SimilarToRewrite.rewrite(CollateRewrite.rewrite(
            OperatorSyntax.rewrite(sql)))))))))))))))

  /** Session-aware chain: adds the ASOF JOIN desugar, which needs the two
    * operand schemas (analysis only — nothing executes, nothing registers).
    * ASOF runs after the text-only stages (so `read_parquet` operands are
    * already path scans) and before QUALIFY (so a QUALIFY tail on an ASOF
    * statement desugars over the rewritten FROM clause). `preAnalyze` is
    * invoked with each subquery operand's text before its schema is
    * analyzed — the statement pipeline passes the guard here, so a blocked
    * scan is rejected before even schema analysis touches it.
    */
  def rewrite(sql: String, spark: org.apache.spark.sql.SparkSession,
      preAnalyze: String => Unit = _ => ()): String = {
    // text-only stages FIRST so every session-aware stage (whose probe
    // queries run through spark.sql) sees desugared relation text — e.g.
    // PIVOT over read_parquet(...) needs the path-scan spelling before its
    // distinct-values scan can analyze
    val t = DistinctOnRewrite.rewrite(StarReplace.rewrite(StarExclude.rewrite(
      SampleRewrite.rewrite(ListSyntax.rewrite(StructSyntax.rewrite(TableFunctions.rewrite(
        FromFirstRewrite.rewrite(JoinKeywords.rewrite(UnpivotRewrite.rewrite(
          FunctionRenames.rewrite(SimilarToRewrite.rewrite(CollateRewrite.rewrite(
            OperatorSyntax.rewrite(sql))))))))))))))
    val v = GetVariableRewrite.rewrite(t, spark)
    val p = PivotRewrite.rewrite(v, spark, preAnalyze)
    QualifyRewrite.rewrite(ColumnsRewrite.rewrite(InsertByName.rewrite(
      AsofJoinRewrite.rewrite(p, spark, preAnalyze), spark, preAnalyze), spark, preAnalyze))
  }
}
