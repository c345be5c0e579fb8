package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.plans.logical.{AlterTableCommand, Command, LogicalPlan}

/** Statement gating by parse-tree walk, re-implementing the reference's
  * `admin_command_guard.cpp` (`:182-246` walker, `:282-409` classifier) and
  * read-only enforcement (`duckdb_statement.cpp:1080-1094`) on Spark's
  * parsed `LogicalPlan`:
  *
  *  - non-admin sessions may not run engine-management commands (SET of
  *    non-gizmosql conf, ADD JAR/FILE, CREATE/DROP DATABASE, catalog
  *    attach analogues) nor scan local filesystem paths (`parquet.`/p``) —
  *    remote object-store schemes stay allowed (`admin_command_guard.cpp:68-76`);
  *  - readonly sessions may not run any write/DDL/DML.
  */
object StatementGuard {

  /** Remote schemes the reference allows for everyone. */
  private val remoteSchemes = Set("s3", "s3a", "gs", "az", "abfs", "abfss", "http", "https", "hf")

  /** SQL `path`-scan formats (`FROM parquet.`...``). */
  private val fileFormats = Set("parquet", "csv", "json", "orc", "text", "avro", "binaryfile")

  private val writeCommandNames = Set(
    "InsertIntoStatement", "InsertIntoTable", "DeleteFromTable", "UpdateTable",
    "MergeIntoTable", "CreateTable", "CreateTableAsSelect", "ReplaceTable",
    "ReplaceTableAsSelect", "DropTable", "TruncateTable", "AlterTable",
    "CreateView", "DropView", "AlterViewAs", "CreateViewStatement",
    "InsertOverwriteDir", "InsertIntoDir")

  private val adminCommandNames = Set(
    "SetCommand", "ResetCommand", "AddJarsCommand", "AddFilesCommand",
    "AddArchivesCommand", "CreateNamespace", "DropNamespace",
    "CreateNamespaceStatement", "SetNamespaceLocation", "RefreshResource")

  sealed trait Verdict
  case object Allowed extends Verdict
  final case class Blocked(reason: String) extends Verdict

  /** True for plans that execute eagerly under `spark.sql` (commands) or
    * write statements — anything the two-phase flight flow must defer.
    */
  def isCommandLike(plan: LogicalPlan): Boolean =
    plan.isInstanceOf[Command] ||
      writeCommandNames.exists(simpleName(plan).startsWith)

  private def simpleName(p: LogicalPlan): String = {
    val n = p.getClass.getSimpleName
    if (n.endsWith("$")) n.dropRight(1) else n
  }

  /** Multipart identifier of any unresolved relation-ish node. DROP TABLE /
    * TRUNCATE TABLE / ALTER TABLE targets parse as UnresolvedTableOrView /
    * UnresolvedTable / UnresolvedIdentifier — NOT UnresolvedRelation — so a
    * gate matching only UnresolvedRelation lets `TRUNCATE TABLE
    * _graft_logs.logs` through (reference rejects it,
    * test_catalog_logging.cpp:181-199).
    */
  private[engine] val relationTarget: PartialFunction[LogicalPlan, Seq[String]] = {
    case r: UnresolvedRelation   => r.multipartIdentifier
    case t: UnresolvedTable      => t.multipartIdentifier
    case t: UnresolvedTableOrView => t.multipartIdentifier
    case v: UnresolvedView       => v.multipartIdentifier
    case i: UnresolvedIdentifier => i.nameParts
  }

  private def isLocalPathScan(r: UnresolvedRelation): Boolean = {
    val parts = r.multipartIdentifier
    if (parts.length == 2 && fileFormats.contains(parts.head.toLowerCase)) {
      val path = parts(1)
      val scheme = path.split("://", 2) match {
        case Array(s, _) => s.toLowerCase
        case _ => ""
      }
      !remoteSchemes.contains(scheme)
    } else false
  }

  /** Every node of the plan, including expression subqueries AND CTE bodies:
    * `UnresolvedWith.cteRelations` are innerChildren (not children), so
    * `collectWithSubqueries` alone would let `WITH c AS (SELECT * FROM
    * parquet.\`/x\`) ...` slip past the gate.
    */
  private[engine] def allNodes(plan: LogicalPlan): Seq[LogicalPlan] = {
    val direct = plan.collectWithSubqueries { case p => p }
    direct.flatMap {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.flatMap(r => allNodes(r._2))
      case _ => Nil
    } ++ direct
  }

  /** Walk the full plan including subqueries and CTEs (the reference
    * recurses into PREPARE/CTE/subquery nodes, `admin_command_guard.cpp:182-246`).
    */
  def check(spark: SparkSession, sql: String, isAdmin: Boolean, readOnly: Boolean): Verdict = {
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case e: Exception => return Blocked(s"parse error: ${e.getMessage}") }

    val nodes = allNodes(plan)

    if (readOnly) {
      nodes.find(p => writeCommandNames.exists(simpleName(p).startsWith) ||
          (p.isInstanceOf[Command] && simpleName(p) != "ExplainCommand" &&
            !simpleName(p).startsWith("Show") && !simpleName(p).startsWith("Describe")))
        .foreach(p => return Blocked(s"read-only session may not run ${simpleName(p)}"))
    }

    if (!isAdmin) {
      // the catalog log sink's store is ADMIN-READ-ONLY, like the
      // instrumentation catalog (catalog_log_sink.h:38-41); resolve each
      // relation against the current database so `USE _graft_logs` cannot
      // route around the gate
      lazy val curDb = TableNames.currentDb(spark)
      nodes.foreach { p =>
        val name = simpleName(p)
        if (adminCommandNames.exists(name.startsWith))
          return Blocked(s"$name requires the admin role")
        p match {
          case r: UnresolvedRelation if isLocalPathScan(r) =>
            return Blocked(s"local filesystem scan '${r.multipartIdentifier.mkString(".")}' requires the admin role")
          case rel if relationTarget.isDefinedAt(rel) && CatalogLogSink.isLogCatalog(
              TableNames.databaseOf(relationTarget(rel).mkString("."), curDb)) =>
            return Blocked("the log catalog is admin-read-only")
          case _ =>
        }
      }
    }

    // System catalog write protection for everyone (reference:
    // duckdb_statement.cpp:1020-1050 — `_gizmosql_system` is immutable).
    // Note: InsertIntoStatement keeps its target in `table`, which is NOT a
    // traversed child — extract write targets explicitly.
    val systemNames = Set("_gizmosql_system", "gizmosql_index_info",
      "gizmosql_view_definition", "gizmosql_settings")
    val writeTargets: Seq[Seq[String]] = nodes.flatMap {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        i.table.collect(relationTarget)
      case a: AlterTableCommand =>
        a.table.collect(relationTarget)
      case p if writeCommandNames.exists(simpleName(p).startsWith) =>
        // head child only: for CTAS that's the target name, while the tail
        // child is the source query whose relations are READS, not targets
        p.children.headOption.toSeq.flatMap(_.collect(relationTarget))
      case _ => Nil
    }
    if (writeTargets.exists(_.exists(part => systemNames.contains(part.toLowerCase))))
      return Blocked("the system catalog is write-protected")

    // SQL writes into the log catalog are blocked for EVERYONE — only the
    // sink's own writer appends (reference: clients get read-only errors on
    // DELETE, test_catalog_logging.cpp:181-193)
    if (CatalogLogSink.activeCatalogs.nonEmpty) {
      val curDb = TableNames.currentDb(spark)
      if (writeTargets.exists(parts => CatalogLogSink.isLogCatalog(
          TableNames.databaseOf(parts.mkString("."), curDb))))
        return Blocked("the log catalog is append-only (writes go through the log sink)")
    }

    Allowed
  }
}
