package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** DuckDB operator spellings and bracket-slice semantics: value-level
  * checks of the whole rewrite chain through spark.sql. Expected values
  * are DuckDB's own results for the same expressions (verified against
  * DuckDB 1.0 semantics: 1-based inclusive slices, negatives from the
  * end, open ends, clamping).
  */
class OperatorSyntaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def one(sql: String): Any =
    spark.sql(Dialect.rewrite(sql)).collect().head.get(0)

  test("// rewrites to integer div") {
    assert(one("SELECT 7 // 2 AS d") == 3L)
    assert(one("SELECT (1 + 6) // 2 AS d") == 3L)
  }

  test("** rewrites to power, left-associative, chain operands") {
    assert(one("SELECT 2 ** 3 AS p") == 8.0)
    assert(one("SELECT 2 ** 3 ** 2 AS p") == 64.0) // (2**3)**2
    assert(one("SELECT 1 + 2 ** 3 AS p") == 9.0)
    assert(one("SELECT abs(-2) ** 2 AS p") == 4.0)
    // inside a string: untouched
    assert(one("SELECT 'a ** b' AS s") == "a ** b")
  }

  test("bare VARCHAR becomes STRING; parameterized VARCHAR(n) untouched") {
    assert(one("SELECT 1::VARCHAR AS s") == "1")
    assert(one("SELECT CAST(2 AS VARCHAR) AS s") == "2")
    // parameterized form reaches Spark's parser untouched (Spark casts to
    // varchar(n) without truncating — host semantics)
    assert(one("SELECT CAST('abc' AS VARCHAR(2)) AS s") == "abc")
    assert(one("SELECT 'VARCHAR' AS s") == "VARCHAR")
  }

  test("VARCHAR in identifier positions is untouched (legal Spark name)") {
    // a column literally named varchar: rewriting it to STRING would break
    // resolution — only cast positions (:: or AS inside CAST) rewrite
    assert(OperatorSyntax.rewrite("SELECT varchar FROM t") == "SELECT varchar FROM t")
    assert(OperatorSyntax.rewrite("SELECT x AS varchar FROM t") == "SELECT x AS varchar FROM t")
    assert(OperatorSyntax.rewrite("SELECT f(varchar) FROM t") == "SELECT f(varchar) FROM t")
    // cast positions still rewrite, including whitespace around ::
    assert(OperatorSyntax.rewrite("SELECT x :: VARCHAR FROM t") == "SELECT x :: STRING FROM t")
    assert(OperatorSyntax.rewrite("SELECT TRY_CAST(x AS VARCHAR) FROM t") ==
      "SELECT TRY_CAST(x AS STRING) FROM t")
    // nested: a non-cast paren between CAST( and AS does not confuse the stack
    assert(OperatorSyntax.rewrite("SELECT CAST(f(a, b) AS VARCHAR) FROM t") ==
      "SELECT CAST(f(a, b) AS STRING) FROM t")
    // value-level: the identifier survives end-to-end
    val df = spark.range(1).selectExpr("'v' AS varchar")
    df.createOrReplaceTempView("vch_t")
    assert(one("SELECT varchar FROM vch_t") == "v")
  }

  test("string-literal subscript is DuckDB 1-based") {
    assert(one("SELECT 'abc'[2] AS c") == "b")
    assert(one("SELECT 'abc'[-1] AS c") == "c")
  }

  test("slice syntax on strings: inclusive, open ends, negatives, clamping") {
    assert(one("SELECT 'abcdef'[2:4] AS s") == "bcd")
    assert(one("SELECT 'abcdef'[3:] AS s") == "cdef")
    assert(one("SELECT 'abcdef'[:3] AS s") == "abc")
    assert(one("SELECT 'abcdef'[-3:] AS s") == "def")
    assert(one("SELECT 'abcdef'[2:100] AS s") == "bcdef")
    assert(one("SELECT 'abcdef'[5:2] AS s") == "")
  }

  test("slice syntax on lists: inclusive, negatives, open ends") {
    assert(one("SELECT [1,2,3,4][2:3] AS l") == Seq(2, 3))
    assert(one("SELECT [1,2,3,4][-1:] AS l") == Seq(4))
    assert(one("SELECT [1,2,3,4][:2] AS l") == Seq(1, 2))
    // column operands work too (type dispatch at analysis)
    assert(spark.sql(Dialect.rewrite(
      "SELECT xs[2:3] AS l FROM (SELECT [10,20,30,40] AS xs)")).collect().head.getSeq[Int](0) == Seq(20, 30))
  }

  test("plain array subscripts keep host 0-based semantics") {
    assert(one("SELECT array(10, 20, 30)[1] AS x") == 20)
  }

  test("escaped quotes inside literals do not desync the cast stack") {
    // ADVICE r9: a backslash-escaped quote ('a\'b(') ended the literal
    // scan early; the trailing paren inside the literal then desynced the
    // cast stack and could flip the VARCHAR rewrite later in the statement.
    assert(one("SELECT 'a\\'b(' AS s, CAST(7 AS VARCHAR) AS c") == "a'b(")
    assert(spark.sql(Dialect.rewrite(
      "SELECT 'a\\'b(' AS s, CAST(7 AS VARCHAR) AS c")).collect().head.get(1) == "7")
    // doubled-quote escape form, same hazard
    assert(one("SELECT 'a''b)(' AS s, 8::VARCHAR AS c") == "a'b)(")
    // backquoted identifier with doubled backquote
    assert(one("SELECT 1 AS `we``ird(`") == 1)
  }

  test("double-quoted identifiers treat backslash literally (ADVICE r10)") {
    // In the DuckDB/Postgres input dialect "…" quotes an IDENTIFIER and
    // backslash is an ordinary character: an identifier ENDING in a
    // backslash must not swallow its closing quote and desync the scan —
    // the trailing `(` inside would then flip a later :: rewrite.
    assert(SqlText.quotedEnd("\"odd\\\" || ('(' )", 0) == 6)
    // rewrite level: the :: cast AFTER such an identifier still rewrites
    // (pre-fix the stray literal paren inside the runaway "literal" broke it)
    val rewritten = Dialect.rewrite("SELECT \"odd\\\" FROM t WHERE x = 9::VARCHAR")
    assert(rewritten.contains("9::STRING"), rewritten)
    // single-quoted literals KEEP backslash-escape handling (ADVICE r9)
    assert(SqlText.quotedEnd("'a\\'b(' + 1", 0) == 7)
  }

  test("generate_series as a table function (inclusive)") {
    val rows = spark.sql(Dialect.rewrite(
      "SELECT * FROM generate_series(1, 3)")).collect().map(_.get(0))
    assert(rows.toSeq == Seq(1, 2, 3))
    val stepped = spark.sql(Dialect.rewrite(
      "SELECT generate_series FROM generate_series(0, 10, 5)")).collect().map(_.get(0))
    assert(stepped.toSeq == Seq(0, 5, 10))
  }
}
