package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class PivotRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("explicit IN list maps onto Spark's PIVOT clause") {
    val out = PivotRewrite.rewrite(
      "PIVOT orders ON o_orderpriority IN ('1-URGENT', '2-HIGH') USING count(*)", spark)
    assert(out ==
      "SELECT * FROM orders PIVOT (count(*) FOR o_orderpriority IN ('1-URGENT', '2-HIGH'))")
  }

  test("auto-detected values: distinct non-NULL scan, ordered") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val out = PivotRewrite.rewrite("PIVOT nation ON n_regionkey USING count(*)", spark)
    assert(out == "SELECT * FROM nation PIVOT (count(*) FOR n_regionkey IN (0, 1, 2, 3, 4))")
    val df = spark.sql(out)
    assert(df.columns.toSet.intersect(Set("0", "1", "2", "3", "4")).size == 5)
    assert(df.count() == 25) // grouped by the remaining (n_nationkey, n_name)
  }

  test("GROUP BY subset projects down before the pivot") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val out = PivotRewrite.rewrite(
      "PIVOT orders ON o_orderstatus USING sum(o_totalprice) AS s GROUP BY o_orderpriority", spark)
    val df = spark.sql(out)
    // one row per priority; one column per status + the group column
    assert(df.count() == 5)
    assert(df.columns.contains("o_orderpriority"))
    assert(df.columns.length >= 3)
  }

  test("parity with manual conditional aggregation") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val piv = spark.sql(PivotRewrite.rewrite(
      "PIVOT orders ON o_orderstatus USING count(*) GROUP BY o_orderpriority", spark))
      .orderBy("o_orderpriority").collect()
    val man = spark.sql(
      "SELECT o_orderpriority, " +
      "count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F, " +
      "count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O, " +
      "count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority").collect()
    assert(piv.length == man.length)
    piv.zip(man).foreach { case (p, m) =>
      assert(p.getString(0) == m.getString(0))
      (1 to 3).foreach(i => assert(p.getLong(i) == m.getLong(i)))
    }
  }

  test("mixed-case GROUP By parses; quote/backslash data values escape safely") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(PivotRewrite.rewrite(
      "PIVOT orders ON o_orderstatus USING count(*) GROUP By o_orderpriority", spark))
    assert(df.count() == 5)
    // auto-IN over values containing a quote, a backslash, and a trailing
    // backslash — each must round-trip into the generated literal
    spark.sql("CREATE OR REPLACE TEMP VIEW pivot_esc AS SELECT * FROM VALUES " +
      "(1, \"it's\"), (2, 'a\\\\b'), (3, 'trail\\\\'), (4, \"it's\") AS t(id, tag)")
    val piv = spark.sql(Dialect.rewrite("PIVOT pivot_esc ON tag USING count(id)", spark))
    assert(piv.columns.toSet == Set("it's", "a\\b", "trail\\"))
    assert(piv.count() == 1)
  }

  test("non-PIVOT statements and malformed forms") {
    val plain = "SELECT * FROM t"
    assert(PivotRewrite.rewrite(plain, spark) == plain)
    intercept[IllegalArgumentException](
      PivotRewrite.rewrite("PIVOT t USING count(*)", spark))
    intercept[IllegalArgumentException](
      PivotRewrite.rewrite("PIVOT t ON c", spark))
    intercept[IllegalArgumentException](
      PivotRewrite.rewrite(
        "PIVOT orders ON o_orderstatus USING sum(o_totalprice + 1) GROUP BY o_orderpriority", spark))
  }
}
