package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** Values pinned against DuckDB 1.0 probes (same literals run there). */
class StringDistancesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(sql).collect()(0)

  test("damerau_levenshtein is the TRUE DL distance, not OSA") {
    val r = one("SELECT damerau_levenshtein('ca','abc') AS a, " +
      "damerau_levenshtein('abcd','acbd') AS b, " +
      "damerau_levenshtein('kitten','sitting') AS c, " +
      "damerau_levenshtein('a cat','an abct') AS d, " +
      "editdist3('kitten','sitting') AS e")
    assert(r.getInt(0) == 2)   // OSA would say 3
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 3)
    assert(r.getInt(4) == 3)
  }

  test("hamming counts differing positions and rejects unequal lengths") {
    assert(one("SELECT hamming('abc','abd') AS h").getInt(0) == 1)
    assert(one("SELECT mismatches('karolin','kathrin') AS h").getInt(0) == 3)
    val e = intercept[Exception] {
      spark.sql("SELECT hamming('ab','abc') AS h").collect()
    }
    assert(e.getMessage.contains("equal length") ||
      e.getCause != null && e.getCause.getMessage.contains("equal length"))
  }

  test("jaccard is character-SET similarity (multiset collapses)") {
    val r = one("SELECT jaccard('abc','abd') AS a, jaccard('aabbb','ab') AS b, " +
      "jaccard('abc','xyz') AS c, jaccard('a','a') AS d")
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 1.0)
    intercept[Exception] { spark.sql("SELECT jaccard('ab','') AS j").collect() }
  }

  test("jaro and jaro-winkler match DuckDB's probed values") {
    val r = one("SELECT jaro_similarity('MARTHA','MARHTA') AS a, " +
      "jaro_winkler_similarity('MARTHA','MARHTA') AS b, " +
      "jaro_similarity('DWAYNE','DUANE') AS c, " +
      "jaro_winkler_similarity('DIXON','DICKSONX') AS d, " +
      "jaro_similarity('aumvdk','aqxyzw') AS e, " +
      "jaro_similarity('','') AS f, jaro_similarity('a','') AS g")
    assert(r.getDouble(0) == 0.9444444444444445)
    assert(r.getDouble(1) == 0.9611111111111111)
    assert(r.getDouble(2) == 0.8222222222222223)
    assert(r.getDouble(3) == 0.8133333333333332)
    assert(r.getDouble(4) == 0.4444444444444444)
    assert(r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 0.0)
  }

  test("winkler prefix boost only applies above 0.7 jaro") {
    val r = one("SELECT jaro_similarity('abqqqqqq','abzzzzzz') AS j, " +
      "jaro_winkler_similarity('abqqqqqq','abzzzzzz') AS jw")
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.5) // common prefix 'ab' must NOT boost at 0.5
  }

  test("distances run over a column (codegen path, not just constant fold)") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("MARTHA", "MARHTA"), ("abc", "abc"))
      .toDF("a", "b")
    df.createOrReplaceTempView("sd_pairs")
    val rows = spark.sql(
      "SELECT damerau_levenshtein(a, b) AS dl, " +
      "ROUND(jaro_winkler_similarity(a, b), 4) AS jw FROM sd_pairs ORDER BY dl")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 3))
    assert(rows(0).getDouble(1) == 1.0)
  }
}
