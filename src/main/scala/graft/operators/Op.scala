package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) the equivalent DuckDB oracle
  * SQL. Column aliases must match exactly between the two — the driver's
  * comparator sorts columns by name before hashing.
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** False for operators whose `run` has eager side effects (DDL/DML,
      * file writes): the prepared-plan cache must rebuild them every call.
      */
    cacheable: Boolean = true)

object Op {
  /** Operator with a DuckDB-checkable oracle. */
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, Some(oracle))

  /** Operator with a side-effecting `run` (writes data or catalog state
    * before returning its result) — excluded from the prepared-plan cache.
    */
  def effectful(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, Some(oracle), cacheable = false)

  /** Operator whose `run` computes eagerly at build time (iterative
    * algorithms like Pregel, which drive jobs to convergence before the
    * result DataFrame exists). Also excluded from the prepared-plan cache:
    * a cached instance would hand back the materialized result instead of
    * recomputing, silently turning a query into a snapshot.
    */
  def eager(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, Some(oracle), cacheable = false)

  /** Operator whose semantics are not expressible in portable SQL
    * (rows-only check by the driver; value-checked in our own ScalaTest).
    */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, None)
}
