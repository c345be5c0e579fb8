package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class StarReplaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("plain * REPLACE desugars to EXCEPT + aliased expressions") {
    val out = StarReplace.rewrite("SELECT * REPLACE (a + 1 AS a) FROM t")
    assert(out == "SELECT * EXCEPT (a), a + 1 AS a FROM t")
  }

  test("combined EXCEPT group (from EXCLUDE) merges into one list") {
    val in = StarExclude.rewrite(
      "SELECT * EXCLUDE (x, y) REPLACE (a + 1 AS a, lower(b) AS b) FROM t")
    val out = StarReplace.rewrite(in)
    assert(out == "SELECT * EXCEPT (x, y, a, b), a + 1 AS a, lower(b) AS b FROM t")
  }

  test("qualified star keeps its qualifier; CAST's inner AS is not the split point") {
    val out = StarReplace.rewrite("SELECT t.* REPLACE (CAST(a AS INT) AS a) FROM t")
    assert(out == "SELECT t.* EXCEPT (a), CAST(a AS INT) AS a FROM t")
  }

  test("CREATE OR REPLACE, the replace() function, and literals are untouched") {
    Seq(
      "CREATE OR REPLACE TEMP VIEW v AS SELECT 1 AS a",
      "SELECT replace(s, 'a', 'b') AS r FROM t",
      "SELECT '* REPLACE (x AS y)' AS s FROM t"
    ).foreach(sql => assert(StarReplace.rewrite(sql) == sql))
  }

  test("occurrences in subqueries each rewrite") {
    val out = StarReplace.rewrite(
      "SELECT * REPLACE (a * 2 AS a) FROM (SELECT * REPLACE (b + 1 AS b) FROM t) s")
    assert(out ==
      "SELECT * EXCEPT (a), a * 2 AS a FROM (SELECT * EXCEPT (b), b + 1 AS b FROM t) s")
  }

  test("malformed items fail loudly") {
    intercept[IllegalArgumentException](
      StarReplace.rewrite("SELECT * REPLACE (a + 1) FROM t"))
    intercept[IllegalArgumentException](
      StarReplace.rewrite("SELECT * REPLACE a + 1 AS a FROM t"))
  }

  test("end-to-end on documents: replaced values and surviving columns") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite(
      "SELECT * EXCLUDE (text) REPLACE (n_chars * 2 AS n_chars, upper(source) AS source) " +
      "FROM documents WHERE doc_id < 5 ORDER BY doc_id"))
    assert(df.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars", "source"))
    val base = spark.sql(
      "SELECT doc_id, n_chars * 2 AS n2, upper(source) AS us FROM documents " +
      "WHERE doc_id < 5 ORDER BY doc_id").collect()
    val got = df.collect()
    assert(got.length == base.length)
    got.zip(base).foreach { case (g, b) =>
      assert(g.getAs[Long]("n_chars") == b.getAs[Long]("n2"))
      assert(g.getAs[String]("source") == b.getAs[String]("us"))
    }
  }
}
