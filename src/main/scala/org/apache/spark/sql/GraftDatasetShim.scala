package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows`, the one Spark API that
  * builds a DataFrame directly over a LogicalPlan. The engine's prepared-plan
  * cache uses it to hand back a dataset rooted at the OPTIMIZED plan of a
  * prepared statement, so re-executions (and actions like `count()` that wrap
  * the plan in a fresh aggregate) re-run Catalyst over an already-converged
  * tree instead of re-paying full optimization per call. Standard community
  * shim pattern for Spark libraries (same approach as e.g. Qbeast's
  * DatasetFactory); nothing here depends on Spark internals beyond the one
  * factory call.
  */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fork an isolated session over the same SparkContext: copied conf +
    * session state, shared executors/caches. The prepared-plan cache probes
    * plan shapes under a clone with adaptive off, so the probe can never be
    * observed by statements planned concurrently in the live session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Wrap an already-parsed catalyst Expression as a Column. Row-level DML
    * carries the parser's expressions (assignment values, conditions) into
    * DataFrame transformations with this, instead of round-tripping through
    * `e.sql` text — whose rendering is not guaranteed re-parseable (quoted
    * identifiers, string literals containing quotes).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
