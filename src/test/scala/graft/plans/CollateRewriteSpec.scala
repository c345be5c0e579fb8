package graft.plans

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

class CollateRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("name mapping: DuckDB collations -> Spark collations, case-insensitive") {
    assert(CollateRewrite.rewrite("SELECT s COLLATE NOCASE FROM t") ==
      "SELECT s COLLATE UTF8_LCASE FROM t")
    assert(CollateRewrite.rewrite("SELECT s collate nocase FROM t") ==
      "SELECT s collate UTF8_LCASE FROM t")
    assert(CollateRewrite.rewrite("ORDER BY s COLLATE NOACCENT") ==
      "ORDER BY s COLLATE UNICODE_AI")
    assert(CollateRewrite.rewrite("ORDER BY s COLLATE NOCASE.NOACCENT, s") ==
      "ORDER BY s COLLATE UNICODE_CI_AI, s")
    assert(CollateRewrite.rewrite("ORDER BY s COLLATE noaccent.nocase") ==
      "ORDER BY s COLLATE UNICODE_CI_AI")
    assert(CollateRewrite.rewrite("s COLLATE \"NOCASE\"") == "s COLLATE UTF8_LCASE")
    assert(CollateRewrite.rewrite("s COLLATE C") == "s COLLATE UTF8_BINARY")
  }

  test("pass-through: ICU locales, Spark names, literals, identifiers") {
    // ICU locale names reach Spark's registry unchanged
    assert(CollateRewrite.rewrite("s COLLATE de") == "s COLLATE de")
    assert(CollateRewrite.rewrite("s COLLATE UNICODE_CI") == "s COLLATE UNICODE_CI")
    // the word inside a string literal is data, not syntax
    val lit = "SELECT 'please COLLATE NOCASE this' AS s"
    assert(CollateRewrite.rewrite(lit) == lit)
    // a column named collate_mode is untouched (word-boundary check)
    val ident = "SELECT collate_mode, nocase_flag FROM t"
    assert(CollateRewrite.rewrite(ident) == ident)
    // statements without COLLATE return the same instance (fast path)
    val plain = "SELECT 1"
    assert(CollateRewrite.rewrite(plain) eq plain)
  }

  test("executes on Spark: case-insensitive equality, accent-insensitive " +
      "equality, collated ordering") {
    val df = spark.sql(Dialect.rewrite(
      "WITH t(s) AS (VALUES ('apple'),('APPLE'),('Banana')) " +
      "SELECT s, CASE WHEN s COLLATE NOCASE = 'Apple' THEN 1 ELSE 0 END AS eq_ci, " +
      "CASE WHEN 'Äpfel' COLLATE NOACCENT = 'Apfel' THEN 1 ELSE 0 END AS eq_ai, " +
      "CASE WHEN 'ÄPFEL' COLLATE NOCASE.NOACCENT = 'äpfel' THEN 1 ELSE 0 END AS eq_ci_ai " +
      "FROM t ORDER BY s COLLATE NOCASE, s"))
    val rows = df.collect()
    // NOCASE ordering groups the apples before Banana; binary tie-break
    assert(rows.map(_.getString(0)).toSeq == Seq("APPLE", "apple", "Banana"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 1, 0))
    assert(rows.forall(_.getInt(2) == 1), "UNICODE_AI equates A-umlaut with A")
    assert(rows.forall(_.getInt(3) == 1), "UNICODE_CI_AI equates across case AND accents")
  }
}
