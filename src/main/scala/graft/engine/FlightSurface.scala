package graft.engine

import graft.types.TypeMapping
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The remaining Flight-SQL-shaped plumbing (SURVEY.md §2.A rows 1-2, 7, 17):
  * statement tickets, GetTables with per-table serialized Arrow schemas, and
  * DML affected-row counts.
  */
object FlightSurface {

  /** Ticket codec (`/root/reference/src/duckdb/duckdb_server.cpp:1089-1108`):
    * `transactionId ':' sql`. DoGet re-prepares from the ticket, so the
    * analyze phase must stay side-effect free (SURVEY §7.3.7) — statements
    * here are idempotent to re-analysis by construction.
    */
  object Ticket {
    def encode(txnId: String, sql: String): String = s"$txnId:$sql"
    def decode(ticket: String): (String, String) = ticket.split(":", 2) match {
      case Array(txn, sql) => (txn, sql)
      case _ => ("", ticket)
    }
  }

  /** Affected-rows result shape for deferred commands. */
  private val updateSchema =
    new org.apache.spark.sql.types.StructType()
      .add("affected_rows", org.apache.spark.sql.types.LongType, nullable = false)

  /** GetFlightInfo(statement): analysis-only schema + ticket. Commands and
    * DML must NOT run here — Spark executes commands eagerly inside
    * `spark.sql`, which would double-execute them across the two-phase
    * GetFlightInfo/DoGet exchange; they defer entirely to DoGet and report
    * the affected-rows schema.
    */
  def flightInfo(session: SessionState, txnId: String, sql: String): (org.apache.spark.sql.types.StructType, String) = {
    val parsed = session.spark.sessionState.sqlParser.parsePlan(sql)
    val schema =
      if (StatementGuard.isCommandLike(parsed)) updateSchema
      else session.spark.sql(sql).schema
    (schema, Ticket.encode(txnId, sql))
  }

  /** DoGet(statement): decode and (re-)execute. */
  def doGet(session: SessionState, ticket: String): DataFrame = {
    val (_, sql) = Ticket.decode(ticket)
    session.spark.sql(sql)
  }

  /** GetTables with `include_schema=true`
    * (`duckdb_tables_schema_batch_reader.cpp:41-120`): each table row carries
    * its Arrow-serialized schema, obtained analysis-only (`LIMIT 0` shape).
    */
  /** Session-aware GetTables: the metadata listing logs as an INTERNAL
    * query — natural severity DEBUG with `is_internal=true`, so it appears
    * only when the session's query_log_level is debug
    * (`test_internal_query_log_level.cpp:175-221`).
    */
  def tablesWithSchema(session: SessionState, tablePattern: Option[String]): DataFrame = {
    QueryLog.statementAttempt(session,
      s"GetTables${tablePattern.fold("")(p => s" pattern='$p'")}",
      isInternal = true, flightMethod = "GetTables")
    tablesWithSchema(session.spark, tablePattern)
  }

  def tablesWithSchema(spark: SparkSession, tablePattern: Option[String] = None): DataFrame = {
    import spark.implicits._
    val base = SystemCatalog.tables(spark, tablePattern = tablePattern).collect()
    val rows = base.toSeq.map { r =>
      val name = r.getAs[String]("table_name")
      // Loud-beats-wrong: only a genuinely-unresolvable view (dropped
      // dependency, stale temp view) degrades to an empty schema string —
      // and it logs; any other failure is a real bug and must surface.
      val arrowSchema =
        try TypeMapping.toArrowSchemaWithRemarks(spark.table(name).limit(0).schema).toJson
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            System.err.println(s"[graft] tablesWithSchema: unreadable table '$name': ${e.getMessage}")
            ""
        }
      (r.getAs[String]("catalog_name"), r.getAs[String]("db_schema_name"),
        name, r.getAs[String]("table_type"), arrowSchema)
    }
    rows.toDF("catalog_name", "db_schema_name", "table_name", "table_type", "table_schema")
  }

  /** Affected-row count for DML (`DoPutCommandStatementUpdate`,
    * `duckdb_statement.cpp:2341-2380`): executes the statement and reads the
    * write command's `numOutputRows` metric (falling back to result row
    * count, as the reference does).
    */
  def executeUpdate(session: SessionState, sql: String): Long = {
    val df = session.spark.sql(sql)
    val rows = df.collect()
    // Executed commands hide their physical plan (and its metrics) behind
    // CommandResultExec; read numOutputRows from the command node ITSELF —
    // scanning the whole plan would pick up scan/filter row counts and
    // inflate the result (e.g. INSERT ... SELECT with a selective WHERE).
    val plan = df.queryExecution.executedPlan match {
      case c: org.apache.spark.sql.execution.CommandResultExec => c.commandPhysicalPlan
      case p => p
    }
    plan.metrics.get("numOutputRows").map(_.value).getOrElse(rows.length.toLong)
  }
}
