package graft.client

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class ShellSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("table renderer aligns columns and marks truncation") {
    val df = spark.range(0, 5).toDF("id")
    val out = Shell.render(df)
    assert(out.contains("| id"))
    assert(out.split("\n").count(_.startsWith("| ")) == 6) // header + 5 rows
    Shell.handleDot(".maxrows 2", null)
    val truncated = Shell.render(df)
    assert(truncated.contains("truncated at 2 rows"))
    Shell.handleDot(".maxrows 40", null)
  }

  test("csv mode renders header plus rows") {
    Shell.handleDot(".mode csv", null)
    val out = Shell.render(spark.sql("SELECT 1 AS a, 'x' AS b"))
    assert(out == "a,b\n1,x")
    Shell.handleDot(".mode table", null)
  }

  test("unknown dot command is reported, .quit signals exit") {
    assert(Shell.handleDot(".bogus", null).contains("unknown command"))
    assert(Shell.handleDot(".quit", null) == null)
  }
}
