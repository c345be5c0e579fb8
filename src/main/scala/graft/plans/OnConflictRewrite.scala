package graft.plans

import org.apache.spark.sql.SparkSession

/** DuckDB upsert syntax → MERGE.
  *
  * `INSERT INTO t [(cols)] <VALUES|SELECT ...> ON CONFLICT (keys)
  * DO NOTHING | DO UPDATE SET assigns [WHERE cond]` desugars to the
  * equivalent MERGE with the source aliased `excluded` — so DuckDB's
  * `excluded.col` references in the SET list work verbatim. The engine's
  * copy-on-write MERGE path executes the result.
  *
  * Declared narrowings (loud errors, never silent):
  *   - the conflict target `(keys)` is REQUIRED — DuckDB's key-less form
  *     and `INSERT OR REPLACE/IGNORE` infer the primary key, and plain
  *     Parquet tables have none;
  *   - multi-row VALUES / SELECT sources must not contain duplicate keys
  *     themselves (MERGE's one-source-row-per-target-row rule; DuckDB 1.0
  *     rejects that case too) — ENFORCED: the desugared source carries a
  *     window-count guard that raises at execution when any key repeats.
  */
object OnConflictRewrite {

  private val Re =
    ("""(?is)^\s*INSERT\s+INTO\s+([A-Za-z_][\w.]*)\s*(?:\(([^)]*)\)\s*)?""" +
     """(.+?)\s+ON\s+CONFLICT\s*(?:\(([^)]*)\)\s*)?DO\s+""" +
     """(?:(NOTHING)|UPDATE\s+SET\s+(.+?))\s*;?\s*$""").r

  private val OrReplaceRe =
    """(?is)^\s*INSERT\s+OR\s+(REPLACE|IGNORE)\s+INTO\b.*""".r

  def matches(sql: String): Boolean = {
    val up = sql.toUpperCase
    up.trim.startsWith("INSERT") &&
      (up.contains("ON CONFLICT") || OrReplaceRe.matches(sql))
  }

  def rewrite(sql: String, spark: SparkSession): String = sql match {
    case OrReplaceRe(kind) =>
      throw new IllegalArgumentException(
        s"INSERT OR ${kind.toUpperCase} infers the table's PRIMARY KEY; Parquet tables " +
        "have none - use INSERT ... ON CONFLICT (key columns) DO " +
        (if (kind.equalsIgnoreCase("REPLACE")) "UPDATE SET ..." else "NOTHING"))
    case Re(target, colsOpt, source, keysOpt, nothing, updateSets) =>
      val cols: Seq[String] = Option(colsOpt)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(spark.table(target).schema.fieldNames.toSeq)
      val keys = Option(keysOpt)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException(
          "ON CONFLICT without a conflict target infers the PRIMARY KEY; Parquet " +
          "tables have none - specify ON CONFLICT (key columns)"))
      val bad = keys.filterNot(k => cols.exists(_.equalsIgnoreCase(k)))
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"ON CONFLICT key(s) ${bad.mkString(", ")} not in the insert column list")
      // Enforce the declared one-source-row-per-conflict-key rule IN the
      // desugared plan (DuckDB 1.0 errors on duplicate source keys; a
      // full-outer MERGE would instead silently emit the matched target row
      // once per duplicate — data corruption). A window count over the keys
      // raises lazily, only when a duplicate actually exists; CASE keeps the
      // raise un-reorderable.
      val dupGuard =
        s"CASE WHEN COUNT(*) OVER (PARTITION BY ${keys.mkString(", ")}) > 1 " +
        "THEN CAST(raise_error('ON CONFLICT source contains duplicate conflict key(s); " +
        "at most one source row may target each key (DuckDB rejects this too)') AS BOOLEAN) " +
        "ELSE TRUE END AS _graft_dup_ok"
      val src =
        s"(SELECT ${cols.mkString(", ")} FROM (SELECT _v.*, $dupGuard " +
        s"FROM ($source) AS _v(${cols.mkString(", ")})) WHERE _graft_dup_ok) AS excluded"
      val on = keys.map(k => s"_t.$k = excluded.$k").mkString(" AND ")
      val insertTail =
        s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"excluded.$c").mkString(", ")})"
      if (nothing != null)
        s"MERGE INTO $target AS _t USING $src ON $on $insertTail"
      else {
        // split an optional trailing WHERE off the SET list (DuckDB's
        // conditional upsert); a WHERE inside a SET subquery is out of
        // scope for the textual split and parses as part of the condition
        val (sets, cond) =
          """(?is)^(.*?)\s+WHERE\s+(.+)$""".r.findFirstMatchIn(updateSets) match {
            case Some(m) => (m.group(1), Some(m.group(2)))
            case None => (updateSets, None)
          }
        val matched = cond match {
          case Some(c) => s"WHEN MATCHED AND ($c) THEN UPDATE SET $sets"
          case None => s"WHEN MATCHED THEN UPDATE SET $sets"
        }
        s"MERGE INTO $target AS _t USING $src ON $on $matched $insertTail"
      }
    case _ =>
      throw new IllegalArgumentException(
        "unsupported INSERT ... ON CONFLICT form (expected: INSERT INTO t [(cols)] " +
        "VALUES ...|SELECT ... ON CONFLICT (keys) DO NOTHING|DO UPDATE SET ...)")
  }
}
