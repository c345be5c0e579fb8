package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class UnpivotRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("statement maps onto Spark's UNPIVOT clause") {
    assert(UnpivotRewrite.rewrite("UNPIVOT m ON q1, q2, q3 INTO NAME quarter VALUE sales") ==
      "SELECT * FROM m UNPIVOT (sales FOR quarter IN (q1, q2, q3))")
  }

  test("end-to-end: wide row melts to (id, name, value) rows") {
    spark.sql("CREATE OR REPLACE TEMP VIEW unpiv_m AS " +
      "SELECT * FROM VALUES (1, 10, 20, 30), (2, 40, 50, 60) AS t(id, q1, q2, q3)")
    val df = spark.sql(Dialect.rewrite("UNPIVOT unpiv_m ON q1, q2, q3 INTO NAME quarter VALUE sales"))
    assert(df.columns.toSeq == Seq("id", "quarter", "sales"))
    assert(df.count() == 6)
    assert(df.filter("id = 1 AND quarter = 'q2'").collect().head.getInt(2) == 20)
  }

  test("non-UNPIVOT statements untouched; malformed INTO fails loudly") {
    val plain = "SELECT * FROM t UNPIVOT (v FOR n IN (a, b))"
    assert(UnpivotRewrite.rewrite(plain) == plain)
    intercept[IllegalArgumentException](
      UnpivotRewrite.rewrite("UNPIVOT t ON a, b INTO NAMES x"))
  }
}
