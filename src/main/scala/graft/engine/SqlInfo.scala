package graft.engine

import org.apache.spark.sql.SparkSession

/** Server capability declarations, mirroring the reference's GetSqlInfo map
  * (`/root/reference/src/duckdb/duckdb_sql_info.cpp:193-388` static keys,
  * `:35-93` dynamic keyword/function lists). Key names follow the Flight SQL
  * SqlInfo enum; values reflect what this Spark-backed engine actually
  * supports.
  */
object SqlInfo {

  val static: Map[String, Any] = Map(
    "FLIGHT_SQL_SERVER_NAME" -> "graft",
    "FLIGHT_SQL_SERVER_VERSION" -> Statement.Version,
    "FLIGHT_SQL_SERVER_ARROW_VERSION" -> "18.3.0",
    "FLIGHT_SQL_SERVER_READ_ONLY" -> false,
    "FLIGHT_SQL_SERVER_TRANSACTION" -> "SQL_SUPPORTED_TRANSACTION_NONE", // declared limitation vs reference
    "SQL_DDL_CATALOG" -> false,
    "SQL_DDL_SCHEMA" -> true,
    "SQL_DDL_TABLE" -> true,
    "SQL_IDENTIFIER_CASE" -> "SQL_CASE_SENSITIVITY_CASE_INSENSITIVE",
    "SQL_IDENTIFIER_QUOTE_CHAR" -> "`",
    "SQL_QUOTED_IDENTIFIER_CASE" -> "SQL_CASE_SENSITIVITY_CASE_INSENSITIVE",
    "SQL_ALL_TABLES_ARE_SELECTABLE" -> true,
    "SQL_NULL_ORDERING" -> "SQL_NULLS_SORTED_AT_START", // Spark ASC default; we emit NULLS LAST explicitly for parity
    "SQL_MAX_COLUMNS_IN_TABLE" -> 0,
    "SQL_SUPPORTED_GROUP_BY" -> "SQL_GROUP_BY_BEYOND_SELECT",
    "SQL_SUPPORTS_LIKE_ESCAPE_CLAUSE" -> true,
    "SQL_SUPPORTS_NON_NULLABLE_COLUMNS" -> true,
    "SQL_SUPPORTED_SUBQUERIES" -> 15, // all four positions, as the reference declares
    "SQL_CORRELATED_SUBQUERIES_SUPPORTED" -> true,
    "SQL_SUPPORTED_UNIONS" -> "SQL_UNION_ALL_AND_DISTINCT",
    "SQL_OUTER_JOINS_SUPPORT_LEVEL" -> "SQL_FULL_OUTER_JOINS",
    "SQL_ANSI92_SUPPORTED_LEVEL" -> "ANSI92_FULL_SQL",
    "SQL_BATCH_UPDATES_SUPPORTED" -> false,
    "SQL_SAVEPOINTS_SUPPORTED" -> false,
    "SQL_NAMED_PARAMETERS_SUPPORTED" -> true, // spark.sql(sql, args) — better than the reference
    "SQL_BULK_INGESTION_SUPPORTED" -> true,
    "SQL_INGEST_TRANSACTIONS_SUPPORTED" -> false)

  /** Dynamic function list (the reference pulls `duckdb_functions()`). */
  def functions(spark: SparkSession): Seq[String] =
    spark.catalog.listFunctions().collect().map(_.name).toSeq.sorted

  /** Keyword list (Spark has no runtime keyword table; the ANSI reserved set
    * is declared statically, where the reference pulls `duckdb_keywords()`).
    */
  val keywords: Seq[String] =
    Seq("SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
      "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS", "ON", "USING",
      "UNION", "INTERSECT", "EXCEPT", "ALL", "DISTINCT", "AS", "AND", "OR", "NOT",
      "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "CAST",
      "CREATE", "TABLE", "VIEW", "INSERT", "INTO", "VALUES", "WITH")
}
