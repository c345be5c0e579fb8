package graft.tools

/** One-off capability probe: does this Spark build support SQL UDFs
  * (CREATE TEMPORARY FUNCTION ... RETURN), SQL table functions, and
  * TABLESAMPLE? Decides whether CREATE MACRO / USING SAMPLE dialect
  * rewrites can target native machinery.
  */
object SqlUdfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION add2(x INT) RETURNS INT RETURN x + 2")
      println("[probe] sqludf: " + spark.sql("SELECT add2(40) AS v").collect().head.getInt(0))
    } catch { case e: Throwable => println("[probe] sqludf FAILED: " + e.getMessage.take(200)) }
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION tf() RETURNS TABLE(a INT) RETURN SELECT 1")
      println("[probe] tablefn: " + spark.sql("SELECT * FROM tf()").count())
    } catch { case e: Throwable => println("[probe] tablefn FAILED: " + e.getMessage.take(200)) }
    try {
      println("[probe] sample: " + spark.sql(
        "SELECT count(*) AS c FROM range(1000) TABLESAMPLE (10 PERCENT)").collect().head.getLong(0))
    } catch { case e: Throwable => println("[probe] sample FAILED: " + String.valueOf(e).take(300)) }
    try {
      println("[probe] sample_rows: " + spark.sql(
        "SELECT count(*) AS c FROM range(1000) TABLESAMPLE (50 ROWS)").collect().head.getLong(0))
    } catch { case e: Throwable => println("[probe] sample_rows FAILED: " + String.valueOf(e).take(300)) }
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION untyped(x) RETURN x + 2")
      println("[probe] untyped: " + spark.sql("SELECT untyped(1) AS v").collect().head.get(0))
    } catch { case e: Throwable => println("[probe] untyped FAILED: " + String.valueOf(e).take(300)) }
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION noret(x INT) RETURN x + 2")
      println("[probe] noret: " + spark.sql("SELECT noret(1) AS v").collect().head.get(0))
    } catch { case e: Throwable => println("[probe] noret FAILED: " + String.valueOf(e).take(300)) }
    try {
      graft.Tables.ensure(spark, "/root/testdata/sf0.001")
      println("[probe] sample_tbl: " + spark.sql(
        "SELECT count(*) AS c FROM lineitem TABLESAMPLE (10 PERCENT)").collect().head.getLong(0))
    } catch { case e: Throwable => println("[probe] sample_tbl FAILED: " + String.valueOf(e).take(300)) }
    spark.stop()
  }
}

object CorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    try {
      spark.sql("CREATE OR REPLACE TABLE cor_probe AS SELECT 1 AS a")
      println("[probe] cor_table: ok")
    } catch { case e: Throwable => println("[probe] cor_table FAILED: " + String.valueOf(e.getMessage).take(150)) }
    try {
      spark.sql("DROP TABLE IF EXISTS cor2")
      spark.sql("CREATE TABLE cor2 (a INT) USING parquet")
      spark.sql("TRUNCATE TABLE cor2")
      println("[probe] truncate: ok")
    } catch { case e: Throwable => println("[probe] truncate FAILED: " + String.valueOf(e.getMessage).take(150)) }
    spark.stop()
  }
}
