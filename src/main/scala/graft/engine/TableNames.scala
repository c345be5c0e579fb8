package graft.engine

import org.apache.spark.sql.SparkSession

/** One canonical spelling per physical table.
  *
  * Spark resolves table identifiers case-insensitively and lets the same
  * table be addressed four ways (`t`, `db.t`, `DB.T`, `spark_catalog.db.t`).
  * Every engine structure KEYED on a table name — the transaction staging
  * map, the commit journal, the manifest, the read-only-attachment gate —
  * must collapse those spellings to one key, or two spellings of one table
  * become two entries and the later fold silently drops the earlier one
  * (r15 ADVICE: case-aliased staged entries lost updates; unqualified names
  * after `USE att` bypassed the read-only gate entirely).
  */
object TableNames {

  /** The session's current database, lower-cased ("default" if unknown). */
  def currentDb(spark: SparkSession): String =
    (try spark.catalog.currentDatabase
    catch { case _: Exception => "default" }).toLowerCase

  /** Canonical form: lower-cased, backquotes stripped, a leading
    * `spark_catalog` segment dropped, and a bare name qualified with the
    * session's current database — always `db.table`.
    */
  def canonical(spark: SparkSession, table: String): String =
    canonicalParts(table.split("\\.").toSeq, currentDb(spark))

  /** [[canonical]] over already-split identifier parts (parser output). */
  def canonicalParts(parts0: Seq[String], currentDb: String): String = {
    val parts = parts0.iterator
      .map(_.trim.stripPrefix("`").stripSuffix("`").toLowerCase)
      .filter(_.nonEmpty).toSeq
    val noCat =
      if (parts.length >= 3 && parts.head == "spark_catalog") parts.tail else parts
    if (noCat.length <= 1) s"$currentDb.${noCat.headOption.getOrElse("")}"
    else noCat.mkString(".")
  }

  /** The database segment a (possibly unqualified / catalog-prefixed) name
    * resolves into — what the read-only-attachment gate checks.
    */
  def databaseOf(table: String, currentDb: String): String =
    canonicalParts(table.split("\\.").toSeq, currentDb).split("\\.").head

  /** Manifest entries keep the historical BARE spelling for default-db
    * tables: manifest temp-view shadowing (cross-session commit visibility)
    * can only shadow unqualified names, and every non-transactional writer
    * checks the manifest under the bare name.
    */
  def manifestName(canonical: String): String =
    if (canonical.startsWith("default.") &&
        canonical.indexOf('.') == canonical.lastIndexOf('.'))
      canonical.substring("default.".length)
    else canonical
}
