package graft.engine

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Staged multi-statement DML transactions over plain Parquet.
  *
  * Mechanics: while a session has an open transaction, each row-level
  * UPDATE/DELETE/MERGE runs the normal copy-on-write computation but its
  * SINK writes the table's FULL post-image to a staging directory and
  * points a session temp view of the same name at it — temp views shadow
  * catalog tables in resolution, so every later statement in the session
  * (reads and further DML alike) sees the transaction's own writes, while
  * other sessions keep reading the committed table. COMMIT applies each
  * touched table's final snapshot through the same INSERT OVERWRITE the
  * non-transactional path uses and drops the shadows; ROLLBACK just drops
  * the shadows — the table was never touched.
  *
  * Guarantees, stated honestly: per-table atomicity (one INSERT OVERWRITE
  * per table at commit), session-local read-your-writes isolation, full
  * rollback, and CRASH atomicity across tables — COMMIT writes a
  * write-ahead journal ([[TxnJournal]]) before touching any table, and
  * bootstrap redoes an interrupted commit from it, so a crash mid-commit
  * can never leave some tables applied and others not once the engine is
  * back up. What remains non-atomic is in-flight VISIBILITY: a concurrent
  * reader during the apply window can see table A new next to table B old
  * (closing that needs a versioned catalog — Delta/Iceberg territory; see
  * TxnJournal's scaladoc). Non-DML writes (INSERT, DDL, ingest) are
  * rejected inside a transaction rather than silently applied eagerly.
  */
object TxnDml {

  /** Session view name that shadows `table` (a CANONICAL `db.t` key, see
    * [[TableNames.canonical]]) during a transaction. Temp views cannot
    * carry a db-qualified name, so an attached-catalog target (`att.t`)
    * shadows under a mangled name; statements inside the txn are remapped
    * to it ([[remapStaged]] / [[txnResolver]]). Default-db tables shadow
    * under their BARE name — temp-view resolution shadows those natively,
    * so every read path sees them without remapping.
    */
  def shadowName(table: String): String = {
    val mn = TableNames.manifestName(table)
    if (mn.contains(".")) "graft_txn_shadow__" + mn.replace(".", "__")
    else mn
  }

  /** The staging sink for [[graft.sources.RowDml.execute]]: full post-image
    * to a fresh staging dir, shadow view re-pointed, dir recorded on the
    * transaction. Always called with `allowPartitionScope = false`, so the
    * frame is the complete table state.
    */
  def stagedSink(txns: Transactions, txnId: String): graft.sources.RowDml.Sink =
    (spark, name, newRows, _) => {
      // Staged under the CANONICAL name (r15 ADVICE: case- or
      // qualification-aliased spellings of one table must map to ONE staged
      // entry, or the later fold silently drops the earlier update) and
      // under the WAREHOUSE, not tmpdir: the commit journal's redo path
      // must still find these post-images after a process restart.
      val key = TableNames.canonical(spark, name)
      val dir = TxnJournal.stageRoot(spark)
        .resolve(java.util.UUID.randomUUID().toString).toString
      newRows.write.parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView(shadowName(key))
      txns.stage(txnId, key, dir)
    }

  /** In-txn table resolution for [[graft.sources.RowDml]]: a staged table
    * (any spelling — the lookup canonicalizes) reads its shadow view
    * (read-your-writes for chained DML); everything else resolves normally.
    */
  def txnResolver(spark: org.apache.spark.sql.SparkSession, txns: Transactions,
      txnId: String): String => org.apache.spark.sql.DataFrame = { name =>
    val key = TableNames.canonical(spark, name)
    val staged = txns.lookup(txnId).exists(t =>
      t.staged.synchronized { t.staged.containsKey(key) })
    spark.table(if (staged) shadowName(key) else name)
  }

  /** Remap a parsed (unresolved) plan's relations from staged table names
    * to their shadow views, recursing into subquery expressions. `staged`
    * maps CANONICAL names ([[TableNames.canonical]]) to shadow view names;
    * identifiers in the plan are canonicalized against `currentDb` before
    * matching, so every spelling of a staged table (bare after `USE`,
    * case-aliased, `spark_catalog`-prefixed) hits its shadow. Names bound
    * by a CTE in the statement are never remapped — CTE resolution outranks
    * tables, and the definition may legitimately reuse a staged name.
    */
  def remapStaged(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      staged: Map[String, String], currentDb: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val cteNames: Set[String] = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    def go(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      p.transformDown {
        case r: UnresolvedRelation
            if !(r.multipartIdentifier.length == 1 &&
                 cteNames.contains(r.multipartIdentifier.head.toLowerCase)) &&
              staged.contains(
                TableNames.canonicalParts(r.multipartIdentifier, currentDb)) =>
          UnresolvedRelation(Seq(
            staged(TableNames.canonicalParts(r.multipartIdentifier, currentDb))))
      }.transformAllExpressions {
        case s: SubqueryExpression => s.withNewPlan(go(s.plan))
      }
    go(plan)
  }

  /** Apply every touched table's final snapshot and drop the shadows.
    * Returns the applied table names (first-touch order).
    *
    * Order of operations is the crash-atomicity protocol: journal first
    * (fsync + atomic rename = the commit point), then the per-table
    * overwrites, then journal deletion. A crash anywhere in the apply loop
    * leaves the journal in place and [[TxnJournal.recover]] redoes the
    * whole entry list at next bootstrap.
    */
  def commitApply(spark: SparkSession, txn: Transactions#Txn): Seq[String] = {
    val entries = txn.staged.synchronized { txn.staged.asScala.toSeq }
    if (entries.isEmpty) return Seq.empty
    // Drop the shadows FIRST so insertInto resolves the catalog tables, not
    // the temp views (inserting into a view is an error).
    entries.foreach { case (name, _) => spark.catalog.dropTempView(shadowName(name)) }
    // Per-table commit locks for the whole journal→fold→drop window: a
    // concurrent writer on any touched table waits out the fold instead of
    // racing it ([[CommitLock]]).
    CommitLock.withTables(spark, entries.map(_._1)) {
    val journal = TxnJournal.write(spark, txn.id, entries)
    // VISIBILITY point: one atomic manifest rename maps every touched table
    // to its post-image BEFORE any base table is overwritten. Reader
    // sessions resolve through the manifest (Statement path refresh), so
    // they observe all of this commit or none of it — never table A new
    // next to table B old ([[ManifestCatalog]]). Manifest entries use the
    // bare spelling for default-db tables (shadow views are unqualified).
    val manifestEntries = entries.map { case (n, d) => (TableNames.manifestName(n), d) }
    ManifestCatalog.publish(spark, manifestEntries)
    val applied = entries.map { case (name, dir) =>
      TxnJournal.foldFull(spark, name, dir)
      name
    }
    TxnJournal.clear(journal)
    // Bases now equal snapshots — dropping the entries never changes what a
    // fresh reader sees.
    ManifestCatalog.drop(spark, manifestEntries)
    // The staging dirs live under the WAREHOUSE (so crash redo can find
    // them) — no tmpdir reaper will ever collect them, so an un-deleted
    // post-image is a permanent per-transaction disk leak. Deletion is
    // DEFERRED through tombstones rather than immediate: a reader that
    // resolved a snapshot through the manifest just before the drop may
    // still be scanning it. Each commit reaps tombstones older than the
    // grace period, bounding the leak to grace-window churn.
    ManifestCatalog.tombstone(spark, entries.map(_._2))
    ManifestCatalog.reapTombstones(spark)
    applied
    }
  }

  /** Discard the transaction's shadows; the catalog tables were never
    * touched. Staging dirs are NOT deleted here (a still-running scan of
    * the shadow may hold them open) — [[TxnJournal.recover]]'s orphan sweep
    * collects them at next bootstrap, when no scan can be live.
    */
  def rollbackDiscard(spark: SparkSession, txn: Transactions#Txn): Unit = {
    val names = txn.staged.synchronized { txn.staged.asScala.keys.toSeq }
    names.foreach(n => spark.catalog.dropTempView(shadowName(n)))
  }
}
