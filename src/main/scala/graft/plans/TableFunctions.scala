package graft.plans

/** DuckDB's file-reading table functions, rewritten onto Spark's path-scan
  * syntax: `read_parquet('p')` → ``parquet.`p` ``, `read_csv[_auto]('p')` →
  * ``csv.`p` ``, `read_json[_auto]('p')` → ``json.`p` `` — the single most
  * common DuckDB idiom (`SELECT * FROM read_parquet(...)`). Runs BEFORE the
  * statement guard, so the guard's local-path-scan gate sees the rewritten
  * form and applies unchanged (non-admin file scans stay blocked exactly as
  * the reference's admin_command_guard blocks its table functions).
  *
  * Only the single-quoted single-path form rewrites (globs pass through in
  * the path; DuckDB's list-of-files and named-parameter forms are not
  * mapped — they fail loudly in the parser rather than silently misread).
  */
object TableFunctions {

  private val Fn = raw"(?i)\b(read_parquet|read_csv_auto|read_csv|read_json_auto|read_json)\s*\(\s*'([^']+)'\s*\)".r

  // DuckDB `FROM generate_series(a, b[, step])` — inclusive series as a
  // table. Spark has no such TVF; the scalar `generate_series` (an
  // inclusive Sequence, registered in DuckDbCompat) exploded in a subquery
  // is semantically identical. Simple-argument form only (no nested
  // parens) — anything fancier fails loudly in the parser.
  private val Series = raw"(?i)\b(FROM|JOIN)\s+generate_series\s*\(([^()]*)\)".r

  def rewrite(sql: String): String = {
    val s0 = Series.replaceAllIn(sql, m => {
      val quotesBefore = sql.substring(0, m.start).count(_ == '\'')
      if (quotesBefore % 2 == 1) java.util.regex.Matcher.quoteReplacement(m.matched)
      else java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} (SELECT explode(generate_series(${m.group(2)})) AS generate_series)")
    })
    rewriteReads(s0)
  }

  private def rewriteReads(sql: String): String = {
    // The function call's own argument IS a quoted literal, so a plain
    // whole-string regex is safe for it — but a free-standing string literal
    // that merely CONTAINS the text (e.g. logged SQL passed as a value) must
    // not rewrite. Splitting on quotes would break the call form; instead,
    // only matches whose opening word is NOT inside an earlier unclosed
    // literal rewrite. Quote parity before the match position decides.
    Fn.replaceAllIn(sql, m => {
      val quotesBefore = sql.substring(0, m.start).count(_ == '\'')
      if (quotesBefore % 2 == 1) java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val fmt = m.group(1).toLowerCase match {
          case "read_parquet" => "parquet"
          case "read_csv_auto" | "read_csv" => "csv"
          case _ => "json"
        }
        java.util.regex.Matcher.quoteReplacement(s"$fmt.`${m.group(2)}`")
      }
    })
  }
}
