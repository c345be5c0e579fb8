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
}
