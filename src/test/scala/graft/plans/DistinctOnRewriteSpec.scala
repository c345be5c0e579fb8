package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** DuckDB DISTINCT ON desugaring: pick rule, ordering, nesting, loud
  * failures. Cross-engine value check is the `compat_distinct_on` oracle.
  */
class DistinctOnRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 10), (2L, "a", 30), (3L, "a", 30), (4L, "b", 5), (5L, "b", 7))
      .toDF("id", "grp", "v").createOrReplaceTempView("don_t")
  }

  test("keeps the first row per group under the query's ORDER BY") {
    setup()
    val out = spark.sql(DistinctOnRewrite.rewrite(
      "SELECT DISTINCT ON (grp) id, grp, v FROM don_t ORDER BY grp, v DESC, id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // grp a: max v = 30, tie broken by id -> id 2; grp b: v 7 -> id 5
    assert(out.toSeq == Seq((2L, "a", 30), (5L, "b", 7)))
  }

  test("WHERE filters before the pick; LIMIT stays outer") {
    setup()
    val out = spark.sql(DistinctOnRewrite.rewrite(
      "SELECT DISTINCT ON (grp) id, grp FROM don_t WHERE v < 30 ORDER BY grp, v DESC, id LIMIT 1"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a")))
  }

  test("no ORDER BY: exactly one row per group (pick arbitrary but stable)") {
    setup()
    val out = spark.sql(DistinctOnRewrite.rewrite(
      "SELECT DISTINCT ON (grp) id, grp FROM don_t"))
    assert(out.select("grp").distinct().count() == 2 && out.count() == 2)
  }

  test("multi-expression key; expressions allowed, not just columns") {
    setup()
    val out = spark.sql(DistinctOnRewrite.rewrite(
      "SELECT DISTINCT ON (grp, v % 3) id, grp, v FROM don_t ORDER BY grp, v % 3, id"))
    assert(out.count() == 4) // groups: (a,1),(a,0),(b,2),(b,1)
  }

  test("DISTINCT ON inside a subquery rewrites (nesting composes)") {
    setup()
    val sql = "SELECT COUNT(*) AS n FROM " +
      "(SELECT DISTINCT ON (grp) id FROM don_t ORDER BY grp, v DESC, id) x"
    assert(spark.sql(DistinctOnRewrite.rewrite(sql)).collect()(0).getLong(0) == 2)
  }

  test("plain DISTINCT and unrelated text pass through untouched") {
    val q1 = "SELECT DISTINCT grp FROM don_t"
    assert(DistinctOnRewrite.rewrite(q1) == q1)
    val q2 = "SELECT 'DISTINCT ON (x)' AS s FROM don_t"
    assert(DistinctOnRewrite.rewrite(q2) == q2)
  }

  test("unsupported combinations fail loudly") {
    def bad(sql: String): String =
      intercept[IllegalArgumentException](DistinctOnRewrite.rewrite(sql)).getMessage
    assert(bad("SELECT DISTINCT ON (grp) COUNT(*) FROM don_t GROUP BY grp")
      .contains("GROUP BY"))
    assert(bad("SELECT DISTINCT ON (grp) id FROM don_t UNION SELECT 1")
      .contains("set-operation"))
    assert(bad("SELECT DISTINCT ON () id FROM don_t ORDER BY id")
      .contains("at least one"))
  }
}
