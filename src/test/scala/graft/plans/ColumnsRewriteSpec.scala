package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}

class ColumnsRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("bare COLUMNS('regex') projects the matching columns") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val out = ColumnsRewrite.rewrite(
      "SELECT COLUMNS('n_.*key') FROM nation ORDER BY n_nationkey", spark)
    assert(out ==
      "SELECT `n_nationkey` AS `n_nationkey`, `n_regionkey` AS `n_regionkey` " +
      "FROM nation ORDER BY n_nationkey")
    assert(spark.sql(out).columns.toSeq == Seq("n_nationkey", "n_regionkey"))
  }

  test("function-wrapped COLUMNS expands per column, named after the column") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite(
      "SELECT MIN(COLUMNS('n_.*key')) FROM nation", spark))
    assert(df.columns.toSeq == Seq("n_nationkey", "n_regionkey"))
    val r = df.collect().head
    assert(r.getAs[Number](0).longValue() == 0L && r.getAs[Number](1).longValue() == 0L)
  }

  test("lockstep expansion of repeated COLUMNS in one item; mixed items keep order") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite(
      "SELECT count(*) AS n, SUM(CASE WHEN COLUMNS('n_.*key') >= 0 AND COLUMNS('n_.*key') < 99 THEN 1 ELSE 0 END) FROM nation", spark))
    assert(df.columns.toSeq == Seq("n", "n_nationkey", "n_regionkey"))
    val r = df.collect().head
    assert(r.getAs[Number](1).longValue() == 25L)
  }

  test("COLUMNS(*) expands every column; statements without COLUMNS untouched") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite("SELECT COUNT(COLUMNS(*)) FROM region", spark))
    assert(df.columns.length == spark.table("region").columns.length)
    val plain = "SELECT a, columns_total FROM t" // identifier containing 'columns'
    assert(ColumnsRewrite.rewrite(plain, spark) == plain)
  }

  test("DISTINCT applies once to the expanded list; mixed-arg COLUMNS rejected") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val df = spark.sql(Dialect.rewrite(
      "SELECT DISTINCT COLUMNS('n_regionkey') FROM nation ORDER BY n_regionkey", spark))
    assert(df.columns.toSeq == Seq("n_regionkey") && df.count() == 5)
    intercept[IllegalArgumentException](ColumnsRewrite.rewrite(
      "SELECT COALESCE(COLUMNS('n_name'), COLUMNS('n_regionkey')) FROM nation", spark))
  }

  test("no-match regex fails loudly") {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    intercept[IllegalArgumentException](
      ColumnsRewrite.rewrite("SELECT COLUMNS('zzz') FROM nation", spark))
  }
}
