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
  * rollback. Cross-TABLE commit is ordered, not atomic (a crash between two
  * table overwrites leaves the first applied) — the reference gets
  * cross-table atomicity from DuckDB's single-file WAL, which has no
  * analogue over a directory of Parquet files; a Delta/Iceberg catalog
  * would slot in here for that. Non-DML writes (INSERT, DDL, ingest) are
  * rejected inside a transaction rather than silently applied eagerly.
  */
object TxnDml {

  /** The staging sink for [[graft.sources.RowDml.execute]]: full post-image
    * to a fresh staging dir, shadow view re-pointed, dir recorded on the
    * transaction. Always called with `allowPartitionScope = false`, so the
    * frame is the complete table state.
    */
  def stagedSink(txns: Transactions, txnId: String): graft.sources.RowDml.Sink =
    (spark, name, newRows, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-txn-stage/" +
        java.util.UUID.randomUUID().toString
      newRows.write.parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView(name)
      txns.stage(txnId, name, dir)
    }

  /** Apply every touched table's final snapshot and drop the shadows.
    * Returns the applied table names (first-touch order).
    */
  def commitApply(spark: SparkSession, txn: Transactions#Txn): Seq[String] = {
    val entries = txn.staged.synchronized { txn.staged.asScala.toSeq }
    entries.map { case (name, dir) =>
      // Drop the shadow FIRST so insertInto resolves the catalog table, not
      // the temp view (inserting into a view is an error).
      spark.catalog.dropTempView(name)
      spark.read.parquet(dir).write.mode("overwrite").insertInto(name)
      name
    }
  }

  /** Discard the transaction's shadows; the catalog tables were never
    * touched. Staging dirs are left for the tmpdir reaper (deleting them
    * eagerly would race any still-running scan of the shadow).
    */
  def rollbackDiscard(spark: SparkSession, txn: Transactions#Txn): Unit = {
    val names = txn.staged.synchronized { txn.staged.asScala.keys.toSeq }
    names.foreach(spark.catalog.dropTempView)
  }
}
