package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class InsertByNameSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("columns bind by name, order-independent; missing columns fill NULL") {
    spark.sql("DROP TABLE IF EXISTS ins_byname_t")
    spark.sql("CREATE TABLE ins_byname_t (a INT, b STRING, c DOUBLE) USING parquet")
    // query order (b, a) differs from the table's (a, b, c); c unmentioned
    val sql = "INSERT INTO ins_byname_t BY NAME SELECT 'x' AS b, 1 AS a"
    val rewritten = InsertByName.rewrite(sql, spark)
    assert(rewritten == "INSERT INTO ins_byname_t (`b`, `a`) SELECT 'x' AS b, 1 AS a")
    spark.sql(rewritten)
    val r = spark.table("ins_byname_t").collect()
    assert(r.length == 1 && r.head.getInt(0) == 1 && r.head.getString(1) == "x" && r.head.isNullAt(2))
    spark.sql("DROP TABLE ins_byname_t")
  }

  test("non-BY-NAME inserts and literals are untouched") {
    val plain = "INSERT INTO t SELECT 1, 2"
    assert(InsertByName.rewrite(plain, spark) == plain)
    val lit = "SELECT 'INSERT INTO t BY NAME SELECT 1' AS s"
    assert(InsertByName.rewrite(lit, spark) == lit)
  }

  test("a query column the table lacks fails in resolution, not silently") {
    spark.sql("DROP TABLE IF EXISTS ins_byname_t2")
    spark.sql("CREATE TABLE ins_byname_t2 (a INT) USING parquet")
    val bad = InsertByName.rewrite(
      "INSERT INTO ins_byname_t2 BY NAME SELECT 1 AS nope", spark)
    intercept[Exception](spark.sql(bad))
    spark.sql("DROP TABLE ins_byname_t2")
  }
}
