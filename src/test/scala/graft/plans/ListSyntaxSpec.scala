package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class ListSyntaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("list literals become array(); subscripts stay") {
    assert(ListSyntax.rewrite("SELECT [1, 2, 3] AS l") == "SELECT array(1, 2, 3) AS l")
    assert(ListSyntax.rewrite("SELECT [] AS l") == "SELECT array() AS l")
    assert(ListSyntax.rewrite("SELECT arr[1] FROM t") == "SELECT arr[1] FROM t")
    assert(ListSyntax.rewrite("SELECT f(x)[2] FROM t") == "SELECT f(x)[2] FROM t")
  }

  test("comprehensions become transform/filter") {
    assert(ListSyntax.rewrite("SELECT [x + 1 FOR x IN l] AS r") ==
      "SELECT transform(l, x -> x + 1) AS r")
    assert(ListSyntax.rewrite("SELECT [upper(t) FOR t IN words IF length(t) > 3] AS r") ==
      "SELECT transform(filter(words, t -> length(t) > 3), t -> upper(t)) AS r")
    // nested: inner literal inside a comprehension
    assert(ListSyntax.rewrite("SELECT [x FOR x IN [1, 2]] AS r") ==
      "SELECT transform(array(1, 2), x -> x) AS r")
  }

  test("FOR inside strings and ordinary FOR keywords untouched") {
    val lit = "SELECT '[x FOR x IN y]' AS s"
    assert(ListSyntax.rewrite(lit) == lit)
    val noBrackets = "SELECT a FROM t"
    assert(ListSyntax.rewrite(noBrackets) == noBrackets)
  }

  test("end-to-end: Spark evaluates the rewritten comprehension") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite(
      "SELECT doc_id, [upper(t) FOR t IN string_split(text, ' ') IF strpos(t, 'a') > 0] AS a_words " +
      "FROM documents WHERE doc_id < 5 ORDER BY doc_id"))
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val words = r.getAs[scala.collection.Seq[String]]("a_words")
      assert(words.forall(w => w == w.toUpperCase && w.toLowerCase.contains("a")))
    }
  }
}
