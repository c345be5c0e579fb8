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
    oracle: Option[String])

object Op {
  /** Operator with a DuckDB-checkable oracle. */
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, Some(oracle))

  /** Operator whose semantics are not expressible in portable SQL
    * (rows-only check by the driver; value-checked in our own ScalaTest).
    */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, None)
}
