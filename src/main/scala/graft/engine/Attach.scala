package graft.engine

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Runtime `ATTACH 'path' AS name` / `DETACH name`, re-expressing the
  * reference's multi-catalog surface (`/root/reference/src/duckdb/
  * duckdb_server.cpp:700-717` — GetTables spans every attached catalog, and
  * ATTACH/DETACH are plain statements).
  *
  * DuckDB's model makes each attached store a CATALOG (`att.main.t`); the
  * Spark-first mapping is a DATABASE (namespace) in `spark_catalog` holding
  * one external parquet table per file in the attached directory. SQL
  * addressing matches the reference's usable form (`att.t`, `USE att`),
  * persists nothing (external tables — DETACH drops metadata only), and the
  * metadata endpoints surface attachments with the reference's shape:
  * catalog_name = attachment, db_schema_name = "main".
  *
  * Registered on the ROOT session's shared catalog, so every client session
  * (isolated `newSession()`s) sees the attachment immediately — the
  * reference's attach is likewise engine-global.
  */
final class AttachManager {

  /** One attachment: directory + writability. Writable attachments are the
    * DuckLake analog (`/root/reference/tests/integration/test_ducklake.cpp`):
    * a transactional catalog over an external directory — CREATE TABLE /
    * INSERT / row-DML / BEGIN…COMMIT land in `<path>/<table>` dirs through
    * the same journal + manifest commit protocol the primary catalog uses.
    */
  final case class Attachment(path: String, readOnly: Boolean)

  private val attachments = new ConcurrentHashMap[String, Attachment]()

  private val NamePattern = "[A-Za-z_][A-Za-z0-9_]*"

  /** Attach the tables under `path` as `name.<table>`; returns the table
    * count. Read-only (the default): every `*.parquet` FILE, directory must
    * be non-empty. Writable: parquet files AND table-shaped subdirectories
    * are registered, and an empty directory is a valid (empty) catalog —
    * `CREATE TABLE name.t` then materializes `<path>/t`. Idempotent per
    * name (re-attach of the same path refreshes — how a restarted server
    * re-discovers tables a previous process created).
    */
  def attach(spark: SparkSession, name: String, path: String,
      readOnly: Boolean = true): Int = {
    if (!name.matches(NamePattern))
      throw new IllegalArgumentException(s"invalid attachment name '$name'")
    val dir = new java.io.File(path)
    if (!dir.isDirectory)
      throw new IllegalArgumentException(s"attach path '$path' is not a directory")
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        // *.parquet matches files AND Spark-written dirs (both always did);
        // writable attachments also discover bare table dirs — the layout
        // CREATE TABLE writes
        f.getName.endsWith(".parquet") ||
          (!readOnly && f.isDirectory && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      }.sortBy(_.getName)
    if (entries.isEmpty && readOnly)
      throw new IllegalArgumentException(s"attach path '$path' contains no parquet tables")
    val existing = Option(attachments.get(name))
    if (existing.exists(_.path != path))
      throw new IllegalArgumentException(s"'$name' is already attached to ${existing.get.path}")
    // Parquet TIMESTAMP(NANOS) columns (e.g. events feeds) are rejected by
    // the schema converter unless read as long — same accommodation as
    // graft.Tables.ensure; the legacy-long schema is then persisted in the
    // table metadata, so later reads from any session decode consistently.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")
    var created = 0
    entries.foreach { f =>
      val table = f.getName.stripSuffix(".parquet")
      if (table.matches(NamePattern)) {
        try {
          spark.sql(s"DROP TABLE IF EXISTS `$name`.`$table`")
          spark.sql(s"CREATE TABLE `$name`.`$table` USING parquet " +
            s"OPTIONS (path '${f.getAbsolutePath}')")
          created += 1
        } catch {
          // An unreadable file must not abort the attach of its siblings.
          case e: org.apache.spark.sql.AnalysisException =>
            System.err.println(s"[attach] skipping $name.$table: ${e.getMessage}")
        }
      }
    }
    if (created == 0 && readOnly)
      throw new IllegalArgumentException(s"no readable parquet tables under '$path'")
    attachments.put(name, Attachment(path, readOnly))
    created
  }

  /** Drop the attachment's namespace (metadata only; the parquet files are
    * untouched — every table, including writable-created ones, is EXTERNAL,
    * so CASCADE never deletes data and a later re-attach sees it all).
    * Returns false for an unknown name.
    */
  def detach(spark: SparkSession, name: String): Boolean =
    Option(attachments.remove(name)) match {
      case None => false
      case Some(_) =>
        spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")
        true
    }

  def names: Set[String] = attachments.keySet().asScala.toSet
  def list: Seq[(String, String)] = attachments.asScala.toSeq.map { case (n, a) => (n, a.path) }.sortBy(_._1)

  def pathOf(name: String): Option[String] = Option(attachments.get(name)).map(_.path)
  def isWritable(name: String): Boolean =
    Option(attachments.get(name)).exists(!_.readOnly)

  /** Throw if `table` (possibly `db.t`-qualified) targets a read-only
    * attachment — loud instead of a confusing parquet-sink failure.
    */
  def assertWritableTarget(table: String): Unit = {
    val head = table.split("\\.").head
    if (table.contains(".") && Option(attachments.get(head)).exists(_.readOnly))
      throw new SecurityException(
        s"attachment '$head' is read-only; ATTACH ... (READ_WRITE) to enable writes")
  }
}

/** Per-session catalog visibility, re-implementing the enterprise
  * `catalog_access` claim (`/root/reference/src/duckdb/
  * duckdb_statement.cpp:859-884`; `src/enterprise/catalog_permissions/`):
  * a session whose token carries the claim may only reference the stores it
  * lists — metadata listings are filtered, and direct SQL references to any
  * other attached store (or to `spark_catalog` itself if unlisted) are
  * rejected at statement creation.
  */
object CatalogAccess {

  /** Store names a statement references: the head of any >=2-part table
    * identifier that names an attachment or `spark_catalog`, plus the target
    * of a `USE`/`SET CATALOG` switch. Walks CTE bodies and subqueries via
    * [[StatementGuard.allNodes]].
    */
  def referencedStores(spark: SparkSession, sql: String, attached: Set[String]): Set[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    val stores = attached + "spark_catalog"
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return Set.empty } // guard reports parse errors
    val fromRelations = StatementGuard.allNodes(plan).flatMap {
      case r: UnresolvedRelation if r.multipartIdentifier.length >= 2 =>
        Some(r.multipartIdentifier.head).filter(stores.contains)
      case _ => None
    }.toSet
    // USE att / USE DATABASE att: parsed as a namespace-switch command whose
    // identifier is not a traversed UnresolvedRelation — match textually.
    val UseRe = s"""(?is)^\\s*USE\\s+(?:DATABASE\\s+|NAMESPACE\\s+)?`?($NamePattern)`?\\s*;?\\s*$$""".r
    val fromUse = sql match {
      case UseRe(n) if stores.contains(n) => Set(n)
      case _ => Set.empty[String]
    }
    fromRelations ++ fromUse
  }

  private val NamePattern = "[A-Za-z_][A-Za-z0-9_]*"

  /** AWS IAM-style wildcard match for catalog_access grant patterns
    * (`/root/reference/tests/integration/test_catalog_wildcards.cpp`):
    * `*` matches any run including empty, `?` exactly one character, all
    * other characters literal and case-sensitive; classic two-pointer
    * backtracking so `*abc` matches `zzabcabc`.
    */
  def matchesCatalogPattern(pattern: String, name: String): Boolean = {
    var p = 0; var n = 0
    var starP = -1; var starN = -1
    while (n < name.length) {
      if (p < pattern.length && (pattern.charAt(p) == '?' || pattern.charAt(p) == name.charAt(n))) {
        p += 1; n += 1
      } else if (p < pattern.length && pattern.charAt(p) == '*') {
        starP = p; starN = n; p += 1
      } else if (starP >= 0) {
        p = starP + 1; starN += 1; n = starN
      } else return false
    }
    while (p < pattern.length && pattern.charAt(p) == '*') p += 1
    p == pattern.length
  }

  /** Throw if the session's grant (None = unrestricted) does not cover every
    * store the statement references. Grant entries are wildcard PATTERNS
    * (exact names are the no-wildcard case, backward-compatible).
    */
  def enforce(session: SessionState, spark: SparkSession, sql: String,
      attached: Set[String]): Unit =
    session.catalogAccess.foreach { allowed =>
      val denied = referencedStores(spark, sql, attached)
        .filterNot(store => allowed.exists(p => matchesCatalogPattern(p, store)))
      if (denied.nonEmpty)
        throw new SecurityException(
          s"catalog '${denied.head}' is not in this session's catalog_access grant")
    }
}
