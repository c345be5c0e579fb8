package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class SampleRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("clause forms map onto TABLESAMPLE") {
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE 10%") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE 10 PERCENT") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE 100 ROWS") ==
      "SELECT * FROM t TABLESAMPLE (100 ROWS)")
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE 100") ==
      "SELECT * FROM t TABLESAMPLE (100 ROWS)")
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE reservoir(10%)") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(SampleRewrite.rewrite("SELECT * FROM t USING SAMPLE 5% (bernoulli, 42) WHERE x > 1") ==
      "SELECT * FROM t TABLESAMPLE (5 PERCENT) REPEATABLE (42) WHERE x > 1")
  }

  test("a sample clause ending a subquery must not eat the closing paren") {
    assert(SampleRewrite.rewrite("SELECT * FROM (SELECT * FROM t USING SAMPLE 10%) x") ==
      "SELECT * FROM (SELECT * FROM t TABLESAMPLE (10 PERCENT)) x")
    assert(SampleRewrite.rewrite("SELECT * FROM (SELECT * FROM t USING SAMPLE 50 ROWS) x") ==
      "SELECT * FROM (SELECT * FROM t TABLESAMPLE (50 ROWS)) x")
  }

  test("JOIN USING and literals are untouched") {
    val ju = "SELECT * FROM a JOIN b USING (k)"
    assert(SampleRewrite.rewrite(ju) == ju)
    val lit = "SELECT 'USING SAMPLE 10%' AS s FROM t"
    assert(SampleRewrite.rewrite(lit) == lit)
  }

  test("end-to-end: sampled scan returns a plausible subset") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val total = spark.table("lineitem").count()
    val rows = spark.sql(Dialect.rewrite(
      "SELECT count(*) AS c FROM lineitem USING SAMPLE 10%")).collect()
    val c = rows.head.getLong(0)
    assert(c > 0 && c < total)
    val nRows = spark.sql(Dialect.rewrite(
      "SELECT count(*) AS c FROM lineitem USING SAMPLE 50 ROWS")).collect().head.getLong(0)
    assert(nRows == 50L)
  }
}
