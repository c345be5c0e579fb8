package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Catalog metadata endpoints, re-implementing the Flight SQL metadata
  * surface (SURVEY.md §2.A rows 15-21) over `spark.catalog`:
  * GetCatalogs / GetDbSchemas / GetTables / GetTableTypes / XdbcTypeInfo /
  * primary & foreign keys (empty-but-shaped — Spark's catalog has no
  * constraints; declared limitation), plus the `_gizmosql_system` helper
  * views (`/root/reference/src/common/system_catalog.cpp:5-62`).
  */
object SystemCatalog {

  /** SQL LIKE pattern (%, _) → regex, for the metadata LIKE filters the
    * reference pushes into its information_schema queries
    * (`duckdb_server.cpp:692-745`).
    */
  def likeToRegex(pattern: String): String =
    "(?i)^" + pattern.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+-?^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  private def likeFilter(c: org.apache.spark.sql.Column, pattern: Option[String]) =
    pattern.map(p => c.rlike(likeToRegex(p))).getOrElse(lit(true))

  /** catalog_access grant entries are IAM-style glob patterns (`*`/`?`,
    * everything else literal, case-sensitive) — the same matcher as
    * `CatalogAccess.matchesCatalogPattern`, expressed as SQL LIKE so the
    * listing filter stays a Column expression.
    */
  private def globToLike(p: String): String = p.flatMap {
    case '*' => "%"
    case '?' => "_"
    case c @ ('%' | '_' | '\\') => "\\" + c
    case c => c.toString
  }

  private def visibleFilter(c: org.apache.spark.sql.Column, visible: Option[Set[String]]) =
    visible.map { v =>
      if (v.isEmpty) lit(false)
      else v.toSeq.map(p => c.like(globToLike(p))).reduce(_ || _)
    }.getOrElse(lit(true))

  /** `SELECT DISTINCT catalog_name ... ORDER BY 1` (`duckdb_server.cpp:1310-1319`).
    * Attached stores surface as catalogs — the reference's model, where each
    * ATTACH adds a catalog (`duckdb_server.cpp:700-717`). `visible` is the
    * session's catalog_access grant (None = unrestricted).
    */
  def catalogs(spark: SparkSession, attached: Set[String] = Set.empty,
      visible: Option[Set[String]] = None): DataFrame = {
    val schema = StructType(Seq(StructField("name", StringType, nullable = false)))
    val extra = spark.createDataFrame(
      attached.toSeq.sorted.map(Row(_)).asJava, schema)
    spark.catalog.listCatalogs().select("name").union(extra).distinct()
      .filter(visibleFilter(col("name"), visible))
      .withColumnRenamed("name", "catalog_name").orderBy("catalog_name")
  }

  /** Schemata filtered by catalog + LIKE pattern (`duckdb_server.cpp:1327-1352`).
    * An attached store reports as (catalog_name = attachment, db_schema_name
    * = "main"), the reference's attached-catalog shape.
    */
  def dbSchemas(spark: SparkSession, schemaPattern: Option[String] = None,
      attached: Set[String] = Set.empty, visible: Option[Set[String]] = None): DataFrame = {
    val dbs = spark.catalog.listDatabases()
      .select(col("catalog").as("catalog_name"), col("name").as("db_schema_name"))
      .collect().toSeq.map { r =>
        val (cat, db) = (Option(r.getString(0)).getOrElse("spark_catalog"), r.getString(1))
        if (attached.contains(db)) Row(db, "main") else Row(cat, db)
      }
    val schema = StructType(Seq(
      StructField("catalog_name", StringType), StructField("db_schema_name", StringType)))
    spark.createDataFrame(dbs.asJava, schema)
      .filter(likeFilter(col("db_schema_name"), schemaPattern))
      .filter(visibleFilter(col("catalog_name"), visible))
      .orderBy("catalog_name", "db_schema_name")
  }

  /** information_schema.tables-shaped listing with LIKE + type filters;
    * temp views surface as LOCAL TEMPORARY like the reference's
    * `temp.main` catalog (`duckdb_server.cpp:309-314`). Spans every
    * database, so attached stores appear alongside the default namespace
    * (as catalog_name = attachment, db_schema_name = "main").
    */
  def tables(
      spark: SparkSession,
      schemaPattern: Option[String] = None,
      tablePattern: Option[String] = None,
      tableTypes: Seq[String] = Nil,
      attached: Set[String] = Set.empty,
      visible: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases().collect().map(_.name).toSeq
    val listed = spark.catalog.listTables().collect().toSeq ++
      dbs.filterNot(_ == spark.catalog.currentDatabase).flatMap { db =>
        try spark.catalog.listTables(db).collect().toSeq.filterNot(_.isTemporary)
        catch { case _: org.apache.spark.sql.AnalysisException => Nil }
      }
    val rows = listed.map { t =>
      val typ = t.tableType match {
        case "TEMPORARY" | "TEMP" => "LOCAL TEMPORARY"
        case "VIEW" => "VIEW"
        case _ => if (t.isTemporary) "LOCAL TEMPORARY" else "BASE TABLE"
      }
      val ns = Option(t.namespace).map(_.mkString(".")).filter(_.nonEmpty).getOrElse("default")
      if (attached.contains(ns)) (ns, "main", t.name, typ)
      else (Option(t.catalog).getOrElse("spark_catalog"), ns, t.name, typ)
    }.distinct
    val df = rows.toDF("catalog_name", "db_schema_name", "table_name", "table_type")
    df.filter(likeFilter(col("db_schema_name"), schemaPattern))
      .filter(likeFilter(col("table_name"), tablePattern))
      .filter(if (tableTypes.nonEmpty) col("table_type").isin(tableTypes: _*) else lit(true))
      // Session-local temp views stay visible under any grant (the
      // reference's temp catalog is never filtered).
      .filter(visibleFilter(col("catalog_name"), visible) ||
        col("table_type") === "LOCAL TEMPORARY")
      .orderBy("catalog_name", "db_schema_name", "table_name")
  }

  /** Constant VALUES ('BASE TABLE'),('LOCAL TEMPORARY'),('VIEW')
    * (`duckdb_server.cpp:1597-1606`).
    */
  def tableTypes(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(StructField("table_type", StringType, nullable = false)))
    spark.createDataFrame(
      List(Row("BASE TABLE"), Row("LOCAL TEMPORARY"), Row("VIEW")).asJava, schema)
  }

  /** JDBC-shaped type-info rows (the reference hard-codes 14 rows,
    * `/root/reference/src/duckdb/duckdb_type_info.cpp:17-133`): one row per
    * wire type with (type_name, data_type code, column_size, literal quoting,
    * nullable, case_sensitive, searchable).
    */
  def xdbcTypeInfo(spark: SparkSession, filterDataType: Option[Int] = None): DataFrame = {
    val schema = StructType(Seq(
      StructField("type_name", StringType, nullable = false),
      StructField("data_type", IntegerType, nullable = false),
      StructField("column_size", IntegerType, nullable = true),
      StructField("literal_prefix", StringType, nullable = true),
      StructField("literal_suffix", StringType, nullable = true),
      StructField("nullable", IntegerType, nullable = false),
      StructField("case_sensitive", BooleanType, nullable = false),
      StructField("searchable", IntegerType, nullable = false)))
    // JDBC java.sql.Types codes.
    val rows = List(
      Row("boolean", 16, 1, null, null, 1, false, 3),
      Row("tinyint", -6, 3, null, null, 1, false, 2),
      Row("smallint", 5, 5, null, null, 1, false, 2),
      Row("integer", 4, 10, null, null, 1, false, 2),
      Row("bigint", -5, 19, null, null, 1, false, 2),
      Row("float", 6, 7, null, null, 1, false, 2),
      Row("double", 8, 15, null, null, 1, false, 2),
      Row("decimal", 3, 38, null, null, 1, false, 2),
      Row("varchar", 12, null, "'", "'", 1, true, 3),
      Row("blob", -3, null, "x'", "'", 1, false, 0),
      Row("date", 91, 10, "'", "'", 1, false, 2),
      Row("time", 92, 8, "'", "'", 1, false, 2),
      Row("timestamp", 93, 26, "'", "'", 1, false, 2),
      Row("interval", 1111, null, "'", "'", 1, false, 2))
    val df = spark.createDataFrame(rows.asJava, schema)
    filterDataType.map(dt => df.filter(col("data_type") === dt)).getOrElse(df)
  }

  /** Primary/foreign-key metadata: Spark's catalog carries no constraints, so
    * these return the correctly-shaped empty result (declared limitation;
    * reference pulls them from `duckdb_constraints()`,
    * `duckdb_server.cpp:1614-1777`).
    */
  def primaryKeys(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("catalog_name", StringType), StructField("db_schema_name", StringType),
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("key_sequence", IntegerType), StructField("key_name", StringType)))
    spark.createDataFrame(List.empty[Row].asJava, schema)
  }

  /** `_gizmosql_system.main.gizmosql_index_info` — empty-but-shaped
    * (`system_catalog.cpp:24-47`; Spark has no indexes).
    */
  def indexInfo(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("table_catalog", StringType), StructField("table_schema", StringType),
      StructField("table_name", StringType), StructField("index_name", StringType),
      StructField("is_unique", BooleanType), StructField("is_primary", BooleanType),
      StructField("expressions", StringType)))
    spark.createDataFrame(List.empty[Row].asJava, schema)
  }

  /** `gizmosql_view_definition` (`system_catalog.cpp:56-61`): view DDL from
    * the session catalog.
    */
  def viewDefinitions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val views = spark.catalog.listTables().collect().toSeq
      .filter(t => t.tableType == "VIEW" || t.isTemporary)
      .map { t =>
        val ddl =
          try spark.sql(s"SHOW CREATE TABLE ${t.name}").collect().headOption.map(_.getString(0)).getOrElse("")
          catch { case _: Exception => "" } // temp views have no SHOW CREATE TABLE
        (Option(t.catalog).getOrElse("spark_catalog"),
          Option(t.namespace).map(_.mkString(".")).filter(_.nonEmpty).getOrElse("default"),
          t.name, ddl)
      }
    views.toDF("table_catalog", "table_schema", "view_name", "view_definition")
  }

  /** Register the system views under `_gizmosql_system`-prefixed temp view
    * names (Spark temp views are single-part; writes to them are blocked by
    * StatementGuard's system-catalog rule).
    */
  def install(spark: SparkSession): Unit = {
    indexInfo(spark).createOrReplaceTempView("gizmosql_index_info")
    viewDefinitions(spark).createOrReplaceTempView("gizmosql_view_definition")
  }
}
