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

  test("csv mode quotes embedded delimiters and quotes") {
    Shell.handleDot(".mode csv", null)
    val out = Shell.render(spark.sql("""SELECT 'a,b' AS x, 'he said "hi"' AS y"""))
    assert(out == "x,y\n\"a,b\",\"he said \"\"hi\"\"\"")
    Shell.handleDot(".mode table", null)
  }

  test("json mode emits typed fields; jsonl one object per line") {
    Shell.handleDot(".mode json", null)
    val out = Shell.render(spark.sql("SELECT 1 AS n, 'x' AS s, CAST(NULL AS INT) AS z"))
    assert(out == """[{"n":1,"s":"x","z":null}]""")
    Shell.handleDot(".mode jsonl", null)
    val lines = Shell.render(spark.range(0, 2).toDF("id")).split("\n")
    assert(lines.toSeq == Seq("""{"id":0}""", """{"id":1}"""))
    Shell.handleDot(".mode table", null)
  }

  test("json mode stays valid JSON under truncation and non-finite doubles") {
    Shell.handleDot(".mode json", null)
    Shell.handleDot(".maxrows 2", null)
    // Truncated result: no note after the closing bracket — still valid JSON.
    val out = Shell.render(spark.range(0, 5).toDF("id"))
    assert(out == """[{"id":0},{"id":1}]""")
    Shell.handleDot(".maxrows 40", null)
    // NaN / Infinity are not JSON literals; they must be quoted.
    val nan = Shell.render(spark.sql(
      "SELECT CAST('NaN' AS DOUBLE) AS a, CAST('Infinity' AS DOUBLE) AS b, 1.5 AS c"))
    assert(nan == """[{"a":"NaN","b":"Infinity","c":1.5}]""")
    Shell.handleDot(".mode table", null)
  }

  test("markdown and line modes render; unknown mode rejected") {
    Shell.handleDot(".mode markdown", null)
    val md = Shell.render(spark.sql("SELECT 1 AS a"))
    assert(md.startsWith("| a") && md.contains("| -"))
    Shell.handleDot(".mode line", null)
    val ln = Shell.render(spark.sql("SELECT 1 AS a, 'x' AS bb"))
    assert(ln.contains(" a = 1") && ln.contains("bb = x"))
    assert(Shell.handleDot(".mode nope", null).contains("unknown mode"))
    Shell.handleDot(".mode table", null)
  }

  test(".headers off and .nullvalue apply to rendering") {
    Shell.handleDot(".mode csv", null)
    Shell.handleDot(".headers off", null)
    Shell.handleDot(".nullvalue -", null)
    val out = Shell.render(spark.sql("SELECT CAST(NULL AS INT) AS a, 2 AS b"))
    assert(out == "-,2")
    Shell.handleDot(".headers on", null)
    Shell.handleDot(".nullvalue NULL", null)
    Shell.handleDot(".mode table", null)
  }
  test(".color on styles table headers and nulls with ANSI; off leaves output plain") {
    Shell.handleDot(".color on", null)
    val out = Shell.render(spark.sql("SELECT 1 AS a, CAST(NULL AS INT) AS b"))
    assert(out.contains("\u001b[1m"))           // bold header
    assert(out.contains("\u001b[2mNULL"))       // dim null cell
    Shell.handleDot(".color off", null)
    val plain = Shell.render(spark.sql("SELECT 1 AS a"))
    assert(!plain.contains("\u001b["))
  }

  test("highlightSql colors keywords, strings, numbers, comments; identifiers untouched") {
    val h = Shell.highlightSql("SELECT a, 'x''y' FROM t WHERE n = 42 -- note")
    assert(h.contains("\u001b[1;34mSELECT\u001b[0m"))
    assert(h.contains("\u001b[1;34mFROM\u001b[0m"))
    assert(h.contains("\u001b[32m'x''y'\u001b[0m"))   // string incl. escaped quote
    assert(h.contains("\u001b[36m42\u001b[0m"))
    assert(h.contains("\u001b[2m-- note\u001b[0m"))
    assert(h.contains(" a,"))                           // identifier uncolored
  }

  test("paginate splits on line count and .pager parses on/off/N") {
    val pages = Shell.paginate((1 to 10).map(_.toString).mkString("\n"), 4)
    assert(pages.size == 3 && pages.head == "1\n2\n3\n4" && pages.last == "9\n10")
    assert(Shell.paginate("one line", 40) == Seq("one line"))
    assert(Shell.handleDot(".pager 25", null) == "pager 25 lines")
    assert(Shell.handleDot(".pager off", null) == "pager off")
    assert(Shell.handleDot(".pager on", null) == "pager 40 lines")
    assert(Shell.handleDot(".pager off", null) == "pager off")
  }
}
