package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** The second wave of DuckDB-dialect aliases: each asserts the exact value
  * DuckDB 1.0 produces for the same text (checked against an embedded
  * DuckDB run while authoring).
  */
class DuckDbCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("len dispatches on type: string length vs list cardinality") {
    val r = spark.sql("SELECT len('abc') AS a, len(array(1,2,3)) AS b, " +
      "len(string_split('x y z', ' ')) AS c").collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 3 && r.getInt(2) == 3)
    // the shape our reference-dialect oracles use constantly
    val s = spark.sql("SELECT list_transform(generate_series(1, len(string_split('a b c',' '))-1), " +
      "i -> i * 10) AS idx").collect()(0)
    assert(s.getSeq[Int](0) == Seq(10, 20))
  }

  test("string/list aliases match DuckDB values") {
    val r = spark.sql(
      "SELECT array_to_string(array(1,2), '-') AS ats, " +
      "list_concat(array(1), array(2)) AS lc, " +
      "list_reverse(array(1,2)) AS lr, " +
      "list_max(array(3,1)) AS mx, list_min(array(3,1)) AS mn, " +
      "strpos('hello', 'll') AS sp, strpos('hello', 'zz') AS sp0, " +
      "regexp_extract_all('a1b22', '[0-9]+') AS rea").collect()(0)
    assert(r.getString(0) == "1-2")
    assert(r.getSeq[Int](1) == Seq(1, 2))
    assert(r.getSeq[Int](2) == Seq(2, 1))
    assert(r.getInt(3) == 3 && r.getInt(4) == 1)
    assert(r.getInt(5) == 3 && r.getInt(6) == 0)
    assert(r.getSeq[String](7) == Seq("1", "22"))
  }

  test("epoch aliases and list_aggregate reducers") {
    val r = spark.sql(
      "SELECT epoch_us(TIMESTAMP_NTZ '2024-01-01 00:00:00') AS us, " +
      "epoch_ms(TIMESTAMP_NTZ '2024-01-01 00:00:00') AS ms, " +
      "list_aggregate(array(1.0d, 2.0d, 3.0d), 'sum') AS s, " +
      "list_aggregate(array(3, 1), 'min') AS mn, " +
      "list_aggregate(array(3, 1), 'max') AS mx, " +
      "list_aggregate(array(3, 1), 'count') AS c").collect()(0)
    assert(r.getLong(0) == 1704067200000000L)
    assert(r.getLong(1) == 1704067200000L)
    assert(r.getDouble(2) == 6.0)
    assert(r.getInt(3) == 1 && r.getInt(4) == 3 && r.getInt(5) == 2)
  }
}
