package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import java.util.concurrent.ConcurrentHashMap

/** Optimizer rule that folds the GIZMOSQL_* pseudo-function UDFs into
  * literals at plan time — the Catalyst-native version of the reference's
  * quote-aware textual substitution (`/root/reference/src/duckdb/
  * duckdb_statement.cpp:242-587`). ScalaUDFs are black boxes to the
  * optimizer; replacing them with literals lets downstream rules constant-
  * fold and prune (e.g. `WHERE gizmosql_role() = 'admin'` collapses before
  * execution instead of evaluating a UDF per row).
  *
  * Values are per-session: `Statement.registerPseudoFunctions` publishes
  * them into [[PseudoFunctionValues]] keyed by the session instance.
  */
case class PseudoFunctionFold(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val values = PseudoFunctionValues.forSession(spark)
    if (values.isEmpty) plan
    else plan.transformAllExpressions {
      case udf: ScalaUDF if udf.udfName.exists(values.contains) =>
        Literal.create(values(udf.udfName.get), udf.dataType)
    }
  }
}

object PseudoFunctionValues {
  // Weak identity keying: SparkSession does not override equals, so
  // WeakHashMap compares by identity; weak keys mean a closed session's
  // entry is collectable (identityHashCode keys could collide across a
  // session's lifetime and would leak).
  private val bySession =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, String]]())

  def publish(spark: SparkSession, values: Map[String, String]): Unit =
    bySession.put(spark, values)

  def forSession(spark: SparkSession): Map[String, String] =
    Option(bySession.get(spark)).getOrElse(Map.empty)
}
