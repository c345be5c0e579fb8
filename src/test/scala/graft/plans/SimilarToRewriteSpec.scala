package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class SimilarToRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(Dialect.rewrite(sql)).collect()(0)

  test("SIMILAR TO is anchored plain regex; % stays literal (DuckDB probe)") {
    val r = one("SELECT 'abc' SIMILAR TO 'ab.' AS a, 'abc' SIMILAR TO 'ab' AS b, " +
      "'abc' SIMILAR TO 'a.*' AS c, 'abc' NOT SIMILAR TO 'x.*' AS d, " +
      "'a%c' SIMILAR TO 'a%c' AS e, 'abc' SIMILAR TO 'a%c' AS f")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }

  test("GLOB translates *, ?, [class] and keeps regex metachars literal") {
    val r = one("SELECT 'abc' GLOB 'a*' AS a, 'abc' GLOB 'a?c' AS b, " +
      "'abc' GLOB 'a[bx]c' AS c, 'abc' GLOB 'ab' AS d, " +
      "'a.c' GLOB 'a.c' AS e, 'abc' GLOB 'a.c' AS f, " +
      "'adc' GLOB 'a[!bx]c' AS g")
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getBoolean(4) && !r.getBoolean(5) && r.getBoolean(6))
  }

  test("regex escape classes survive the literal re-embed (backslash doubling)") {
    val r = one("""SELECT '123' SIMILAR TO '\d+' AS a, 'abc' SIMILAR TO '\d+' AS b, """ +
      """'a b' SIMILAR TO 'a\sb' AS c, 'word' SIMILAR TO '\w+' AS d""")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
  }

  test("strings are untouched; identifiers named similar survive; errors loud") {
    val s = "SELECT 'x SIMILAR TO y' AS t, similar FROM v"
    assert(SimilarToRewrite.rewrite(s) == s)
    intercept[IllegalArgumentException] {
      SimilarToRewrite.rewrite("SELECT a SIMILAR TO b FROM t")
    }
    // second pass is a no-op (Dialect idempotence contract)
    val once = SimilarToRewrite.rewrite("SELECT x GLOB 'a*[0-9].z' AS g FROM t")
    assert(SimilarToRewrite.rewrite(once) == once)
  }
}
