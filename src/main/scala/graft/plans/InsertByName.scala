package graft.plans

import org.apache.spark.sql.SparkSession

/** DuckDB `INSERT INTO tbl BY NAME <query>`: the query's columns bind to
  * the table's columns BY NAME instead of position (unmentioned table
  * columns fill with NULL). Spark expresses the same with an explicit
  * column list, so the rewrite analyzes the query's schema (names only —
  * nothing executes) and emits `INSERT INTO tbl (c1, ..., cn) <query>`.
  * A query column the table lacks fails in Spark's own resolution, same
  * as DuckDB.
  */
object InsertByName {
  private val Re =
    """(?is)^\s*INSERT\s+INTO\s+((?:[\w.]+)|`[^`]+`)\s+BY\s+NAME\s+(.+?);?\s*$""".r

  def rewrite(sql: String, spark: SparkSession,
      preAnalyze: String => Unit = _ => ()): String = sql match {
    case Re(tbl, query) =>
      preAnalyze(query)
      val cols = spark.sql(query).schema.fields.map(f => SqlScan.q(f.name))
      s"INSERT INTO $tbl (${cols.mkString(", ")}) $query"
    case _ => sql
  }
}
