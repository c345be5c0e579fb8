package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Query instrumentation, re-implementing the reference's observability layer
  * (`/root/reference/src/common/gizmosql_telemetry.cpp` metrics,
  * `gizmosql_logging.cpp` structured logs with SQL redaction, and the
  * per-execution profile capture `duckdb_statement.cpp:2210-2221`) on
  * Spark's native hooks: a `QueryExecutionListener` records per-statement
  * rows/duration/status, and profile capture stores the executed physical
  * plan (`df.queryExecution`) when `gizmosql.capture_query_profile` is on.
  */
final class Observability(captureProfile: () => Boolean,
    tagFor: SparkSession => String = _ => "") extends QueryExecutionListener {

  final case class QueryRecord(
      name: String, durationNs: Long, status: String,
      outputRows: Option[Long], profile: Option[String],
      tag: String = "",
      completedAtMs: Long = System.currentTimeMillis())

  private val records = new ConcurrentLinkedQueue[QueryRecord]()

  /** Redact literals from logged SQL, as the reference's logger does. */
  def redact(sql: String): String = Observability.redact(sql)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    val profile = if (captureProfile()) Some(qe.executedPlan.toString) else None
    records.add(QueryRecord(funcName, durationNs, "success", rows, profile,
      tagFor(qe.sparkSession)))
  }

  override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
    records.add(QueryRecord(funcName, 0L, s"error: ${error.getMessage}", None, None,
      tagFor(qe.sparkSession)))

  def snapshot: Seq[QueryRecord] = records.asScala.toSeq
  def clear(): Unit = records.clear()

  def install(spark: SparkSession): this.type = {
    spark.listenerManager.register(this)
    this
  }

  /** Instrumentation view (the enterprise `gizmosql_statements` table shape,
    * reference dir `src/enterprise/instrumentation`): recorded executions as
    * a queryable DataFrame.
    */
  def statementsView(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("operation", StringType), StructField("duration_ms", DoubleType),
      StructField("status", StringType), StructField("output_rows", LongType),
      StructField("has_profile", BooleanType),
      // the reference's sql_statements.query_tag: the session's tag at
      // execution time, '' when unset (test_instance_session_query_tags.cpp)
      StructField("query_tag", StringType)))
    val rows = snapshot.map(r => Row(r.name, r.durationNs / 1e6, r.status,
      r.outputRows.map(Long.box).orNull, r.profile.isDefined, r.tag))
    spark.createDataFrame(rows.asJava, schema)
  }

  def installView(spark: SparkSession): Unit =
    statementsView(spark).createOrReplaceTempView("gizmosql_statements")
}

object Observability {
  /** Redact literals from logged SQL, as the reference's logger does —
    * shared by the listener records and the query log. */
  def redact(sql: String): String =
    sql.replaceAll("'[^']*'", "'?'").replaceAll("(?<=[=<>(,\\s])\\d+(\\.\\d+)?", "?")
}
