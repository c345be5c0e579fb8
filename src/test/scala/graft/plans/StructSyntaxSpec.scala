package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class StructSyntaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("struct literals rewrite to named_struct and execute") {
    assert(StructSyntax.rewrite("SELECT {'a': 1, 'b': 'x'} AS s") ==
      "SELECT named_struct('a', 1, 'b', 'x') AS s")
    val r = spark.sql(Dialect.rewrite("SELECT {'a': 1, 'b': 'x'} AS s")).collect()(0)
    val s = r.getStruct(0)
    assert(s.getInt(0) == 1 && s.getString(1) == "x")
    assert(s.schema.fieldNames.toSeq == Seq("a", "b"))
  }

  test("identifier keys, nesting, casts, and brackets compose") {
    assert(StructSyntax.rewrite("SELECT {a: 1, b: {c: 2}} AS s") ==
      "SELECT named_struct('a', 1, 'b', named_struct('c', 2)) AS s")
    // a :: cast inside a value never splits the pair
    assert(StructSyntax.rewrite("SELECT {'v': 1::BIGINT} AS s") ==
      "SELECT named_struct('v', 1::BIGINT) AS s")
    // bracket list inside a struct value (ListSyntax runs after in Dialect)
    val r = spark.sql(Dialect.rewrite("SELECT {'xs': [1, 2, 3]} AS s")).collect()(0)
    assert(r.getStruct(0).getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("MAP braces rewrite to map()") {
    assert(StructSyntax.rewrite("SELECT MAP {'k1': 10, 'k2': 20} AS m") ==
      "SELECT map('k1', 10, 'k2', 20) AS m")
    val r = spark.sql(Dialect.rewrite("SELECT MAP {'k1': 10, 'k2': 20} AS m")).collect()(0)
    assert(r.getMap[String, Int](0) == Map("k1" -> 10, "k2" -> 20))
  }

  test("strings with braces are untouched; errors are loud") {
    val s = "SELECT '{not: a struct}' AS t, \"we{ird\" FROM x"
    assert(StructSyntax.rewrite(s) == s)
    intercept[IllegalArgumentException](StructSyntax.rewrite("SELECT {} AS s"))
    intercept[IllegalArgumentException](StructSyntax.rewrite("SELECT {1, 2} AS s"))
  }
}
