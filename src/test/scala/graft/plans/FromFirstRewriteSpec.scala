package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class FromFirstRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("bare FROM implies SELECT *; clauses carry over") {
    assert(FromFirstRewrite.rewrite("FROM t") == "SELECT * FROM t")
    assert(FromFirstRewrite.rewrite("FROM t WHERE x > 1 ORDER BY x LIMIT 3") ==
      "SELECT * FROM t WHERE x > 1 ORDER BY x LIMIT 3")
  }

  test("trailing SELECT list lifts to the front") {
    assert(FromFirstRewrite.rewrite("FROM t SELECT a, b WHERE a > 1") ==
      "SELECT a, b FROM t WHERE a > 1")
    assert(FromFirstRewrite.rewrite("FROM t JOIN u ON t.k = u.k SELECT t.a") ==
      "SELECT t.a FROM t JOIN u ON t.k = u.k")
  }

  test("normal statements, subqueries, and literals are untouched") {
    Seq(
      "SELECT * FROM t",
      "WITH c AS (SELECT 1) SELECT * FROM c",
      "SELECT 'FROM t' AS s",
      "  SELECT x FROM (SELECT 1 AS x) q"
    ).foreach(sql => assert(FromFirstRewrite.rewrite(sql) == sql))
  }

  test("end-to-end through the dialect chain, composing with other stages") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val r1 = spark.sql(Dialect.rewrite("FROM nation WHERE n_regionkey = 0 ORDER BY n_nationkey"))
    assert(r1.count() == 5 && r1.columns.contains("n_name"))
    val r2 = spark.sql(Dialect.rewrite("FROM nation SELECT n_name, n_regionkey WHERE n_regionkey <= 1"))
    assert(r2.columns.toSeq == Seq("n_name", "n_regionkey") && r2.count() == 10)
    // composes: FROM-first + star EXCLUDE
    val r3 = spark.sql(Dialect.rewrite("FROM nation SELECT * EXCLUDE (n_name) LIMIT 1"))
    assert(!r3.columns.contains("n_name"))
  }
}
