package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class JoinKeywordsSpec extends AnyFunSuite {

  test("bare SEMI/ANTI JOIN gain the LEFT qualifier") {
    assert(JoinKeywords.rewrite("FROM a SEMI JOIN b ON x = y") ==
      "FROM a LEFT SEMI JOIN b ON x = y")
    assert(JoinKeywords.rewrite("FROM a anti join b ON x = y") ==
      "FROM a LEFT anti join b ON x = y")
  }

  test("already-qualified joins are untouched") {
    val l = "FROM a LEFT SEMI JOIN b ON x = y"
    assert(JoinKeywords.rewrite(l) == l)
    val r = "FROM a RIGHT ANTI JOIN b ON x = y"
    assert(JoinKeywords.rewrite(r) == r)
  }

  test("string literals and non-join uses are untouched") {
    val s = "SELECT 'a SEMI JOIN b' AS t, semi, anti FROM x"
    assert(JoinKeywords.rewrite(s) == s)
    val id = "SELECT t.semi FROM t ORDER BY anti"
    assert(JoinKeywords.rewrite(id) == id)
  }

  test("idempotent: a second pass is a no-op") {
    val once = JoinKeywords.rewrite("FROM a SEMI JOIN b ON x = y")
    assert(JoinKeywords.rewrite(once) == once)
  }
}
